"""MXU contraction-depth probe: is the bwddots census cost intrinsic?

docs/CENSUS_r05.json measures the epoch kernel's two backward
contractions (dw_pix: (ntri=36,TB)@(36,P); du_pix: (8,TB)@(8,P), both
producing (TB,P) planes) at ~27.8 ns/spectrum vs ~9.5 ns predicted from
raw MXU flops at the calibrated f32 peak. Hypothesis: a dot whose
contraction depth K is far below the MXU's pass depth still pays a
full(ish) pass — the flops-at-peak prediction under-prices K<<128
contractions, so the measured cost is a hardware floor of the
algorithm's shape (Nh=8 -> K=36/8), not lowering slack.

This probe times a standalone Pallas kernel that replicates the dot
shapes in isolation: grid of G steps, operands VMEM-resident (constant
index_map — no per-step DMA), each step issuing the variant's dots into
(TB,P) outputs consumed by one elementwise combine (prevents DCE,
mimics the dd-chain read-back). Variants share everything except the
contraction depth(s):

  pair36+8   — production shape: two dots, K=36 and K=8
  single8    — one dot, K=8
  single44   — one dot, K=44 (the pair fused, were it semantically legal)
  single64   — one dot, K=64
  single128  — one dot, K=128 (a full nominal pass)
  vpu8       — the K=8 contraction as 8 broadcast-fma outer products on
               the VPU (no MXU dot; transpose of the left operand
               provided pre-staged)
  pair36+vpu8— the K=36 dot + the VPU outer-product K=8 (the candidate
               kernel restructure: saves one fixed dot issue)
  wide44     — ONE K=44 dot against a block-diag [[G,0],[0,U]] (44,2P)
               rhs, whose (TB,2P) output is [dw | du] side by side —
               one dot issue, 2x the output tiles, half the macs
               structural zeros (the alternative restructure)

If time is ~flat in K (single8 ~ single128), the pass-depth floor is
proven and the census/binding model must price these dots at
K_eff = pass depth, which closes the bwddots measured-vs-predicted gap.
If time scales ~linearly with K, the gap is elsewhere (output traffic).

Methodology per CLAUDE.md: inputs vary every call from a pre-staged
device pool, variants interleave round-robin in the same congestion
window, one small host pull closes each window, medians over rounds.

Run on the real TPU from the repo root:
    python tools/mxu_kdepth.py [--rounds K] [--grid G] [--calls C]
Writes docs/KDEPTH_r05.json and a summary to stdout.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TB = 256
P = 1920
KMAX = 128
_HP = dict(preferred_element_type=jnp.float32)

#: (name, K1, K2-or-None, vpu_k2). K2 mimics the production second (du)
#: dot; vpu_k2=True computes that K2 contraction as K2 broadcast-fma
#: outer products on the VPU (from a pre-transposed (TB, KMAX) operand)
#: instead of an MXU dot — the candidate replacement if the per-dot
#: fixed pass cost dominates at K=8.
VARIANTS = (
    ("pair36+8", 36, 8, False),
    ("single8", 8, None, False),
    ("single44", 44, None, False),
    ("single64", 64, None, False),
    ("single128", 128, None, False),
    ("vpu8", 0, 8, True),
    ("pair36+vpu8", 36, 8, True),
    ("wide44", 36, 8, "wide"),
)


def _body(l_ref, lt_ref, r_ref, r2_ref, o_ref, *, grid, k1, k2, vpu_k2):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    # cheap per-step variation so Mosaic cannot hoist the dots out of the
    # grid loop: one scalar multiply of the (KMAX, TB) left operand,
    # identical across variants
    scale = 1.0 + jax.lax.convert_element_type(j, jnp.float32) * 1e-9
    l_all = l_ref[...] * scale
    if vpu_k2 == "wide":
        # ONE K=(k1+k2) dot against the block-diag [[G,0],[0,U]] rhs:
        # the (TB, 2P) output is [dw | du] side by side — pays one dot
        # issue instead of two, at 2x the output tiles (half the macs
        # are structural zeros). The kernel analogue rebuilds r2 once
        # per batch (16 grid steps amortize it).
        wide = jax.lax.dot_general(
            l_all[: k1 + k2], r2_ref[0 : k1 + k2, :],
            (((0,), (0,)), ((), ())), **_HP,
        )  # (TB, 2P)
        o_ref[...] += wide[:, :P] * 0.5 + wide[:, P:] * 0.25
        return
    if k1:
        dw = jax.lax.dot_general(
            l_all[:k1], r_ref[0:k1, :], (((0,), (0,)), ((), ())), **_HP
        )  # (TB, P)
    else:
        dw = 0.0
    if k2 is not None and vpu_k2:
        # K2 outer products: (TB,1) lane-broadcast x (1,P) row — fma
        # chain on the VPU, no MXU pass. lt holds the transposed left
        # operand (its transpose cost is NOT probed here; in the kernel
        # alpha would have to be produced lane-minor, see docstring).
        lt = lt_ref[...] * scale
        du = lt[:, k1 : k1 + 1] * r_ref[k1 : k1 + 1, :]
        for jj in range(1, k2):
            du = du + (lt[:, k1 + jj : k1 + jj + 1]
                       * r_ref[k1 + jj : k1 + jj + 1, :])
        o_ref[...] += dw * 0.5 + du * 0.25
    elif k2 is not None:
        du = jax.lax.dot_general(
            l_all[k1 : k1 + k2], r_ref[k1 : k1 + k2, :],
            (((0,), (0,)), ((), ())), **_HP,
        )
        # read both planes back, like the dd chain does
        o_ref[...] += dw * 0.5 + du * 0.25
    else:
        o_ref[...] += dw * 0.5


def make_fn(k1, k2, grid, vpu_k2=False):
    kern = functools.partial(_body, grid=grid, k1=k1, k2=k2, vpu_k2=vpu_k2)
    call = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((KMAX, TB), lambda j: (0, 0)),
            pl.BlockSpec((TB, KMAX), lambda j: (0, 0)),
            pl.BlockSpec((KMAX, P), lambda j: (0, 0)),
            pl.BlockSpec((KMAX, 2 * P), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TB, P), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((TB, P), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )
    return jax.jit(lambda l, lt, r, r2: call(l, lt, r, r2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--grid", type=int, default=4096,
                    help="grid steps per launch")
    ap.add_argument("--calls", type=int, default=8,
                    help="chained launches per timing window")
    args = ap.parse_args()

    t0 = time.perf_counter()

    def stage(msg):
        print(f"[kdepth +{time.perf_counter() - t0:6.1f}s] {msg}",
              file=sys.stderr, flush=True)

    rng = np.random.default_rng(7)
    # operand pool: vary the LEFT operand per call (small: 128 KB each);
    # lt = its transpose, for the VPU outer-product variants
    l_np = [rng.standard_normal((KMAX, TB)).astype(np.float32) * 1e-3
            for _ in range(args.calls)]
    l_pool = [jax.device_put(jnp.asarray(x)) for x in l_np]
    lt_pool = [jax.device_put(jnp.asarray(x.T.copy())) for x in l_np]
    r_np = rng.standard_normal((KMAX, P)).astype(np.float32) * 1e-3
    r_dev = jax.device_put(jnp.asarray(r_np))
    # block-diag [[G, 0], [0, U]] rhs for the wide44 variant (G = rows
    # 0:36 in lanes 0:P, U = rows 36:44 in lanes P:2P)
    r2_np = np.zeros((KMAX, 2 * P), np.float32)
    r2_np[0:36, :P] = r_np[0:36]
    r2_np[36:44, P:] = r_np[36:44]
    r2_dev = jax.device_put(jnp.asarray(r2_np))
    jax.block_until_ready(r2_dev)

    fns = {}
    for name, k1, k2, vpu_k2 in VARIANTS:
        stage(f"compile {name}")
        fns[name] = make_fn(k1, k2, args.grid, vpu_k2)
        _ = float(np.asarray(
            fns[name](l_pool[0], lt_pool[0], r_dev, r2_dev))[0, 0])

    scale2 = jax.jit(lambda a, b, s: (a * s, b * s))

    def window(fn, lp, ltp):
        t = time.perf_counter()
        for l, lt in zip(lp, ltp):
            out = fn(l, lt, r_dev, r2_dev)
        _ = float(np.asarray(out)[0, 0])  # sync
        return (time.perf_counter() - t) / (args.calls * args.grid)

    times = {name: [] for name, _, _, _ in VARIANTS}
    for r in range(args.rounds):
        # fresh (executable, input) pairs EVERY round: the tunnel
        # memoizes identical executions (CLAUDE.md), so replaying the
        # same pool across rounds could return cached results and report
        # near-RTT-only step times. Device-side re-scaling (outside the
        # timed windows) gives each round distinct inputs without host
        # transfers.
        s = jnp.float32(1.0 + 1e-6 * (r + 1))
        pool_r = [scale2(l, lt, s) for l, lt in zip(l_pool, lt_pool)]
        lp, ltp = [a for a, _ in pool_r], [b for _, b in pool_r]
        jax.block_until_ready(lp[-1])
        for name, _, _, _ in VARIANTS:  # interleaved round-robin
            times[name].append(window(fns[name], lp, ltp))
        stage(f"round {r + 1}/{args.rounds} done")

    mxu_tflops = None
    try:
        import bench
        stage("mxu f32 peak calibration")
        mxu_tflops, _bf16, _rd = bench.calibrate_peaks()
    except Exception as e:  # noqa: BLE001
        stage(f"calibration skipped: {e}")

    record = {
        "what": "standalone MXU contraction-depth probe for the census "
                "bwddots section (two (K,TB)@(K,P) dots into (TB,P) "
                "planes, VMEM-resident operands, per-grid-step times)",
        "tb": TB, "p": P, "grid": args.grid,
        "variants": {},
        "mxu_peak_tflops_f32": None if mxu_tflops is None
        else round(mxu_tflops, 2),
    }
    for name, k1, k2, vpu_k2 in VARIANTS:
        med = float(np.median(times[name]))
        flops = 2 * TB * P * (k1 + (k2 or 0))
        rec = {
            "k": ([k1] if k1 else []) + ([k2] if k2 is not None else []),
            "k2_on_vpu": vpu_k2,
            "us_per_step": round(med * 1e6, 3),
            "ns_per_spectrum_equiv": round(med / TB * 1e9, 2),
            "flops_per_step": flops,
            "samples_us": [round(x * 1e6, 3) for x in sorted(times[name])],
        }
        if mxu_tflops:
            rec["naive_peak_us"] = round(flops / (mxu_tflops * 1e12) * 1e6, 3)
        record["variants"][name] = rec
        print(f"{name:>10}: {rec['us_per_step']:8.3f} us/step "
              f"({rec['ns_per_spectrum_equiv']:6.2f} ns/spectrum-equiv)")

    # verdict: compare single128 vs single8 scaling
    t8 = record["variants"]["single8"]["us_per_step"]
    t128 = record["variants"]["single128"]["us_per_step"]
    record["k_scaling_128_over_8"] = round(t128 / t8, 3) if t8 else None
    record["flat_in_k"] = bool(t8 and t128 / t8 < 2.0)

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "KDEPTH_r05.json")
    with open(out_path, "w") as fh:
        json.dump(record, fh, indent=1)
    print(json.dumps({k: v for k, v in record.items()
                      if k != "variants"}, indent=1))


if __name__ == "__main__":
    main()
