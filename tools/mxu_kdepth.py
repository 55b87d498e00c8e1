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

#: (name, K1, K2-or-None). K2 mimics the production second (du) dot.
VARIANTS = (
    ("pair36+8", 36, 8),
    ("single8", 8, None),
    ("single44", 44, None),
    ("single64", 64, None),
    ("single128", 128, None),
)


def _body(l_ref, r_ref, o_ref, *, grid, k1, k2):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    # cheap per-step variation so Mosaic cannot hoist the dots out of the
    # grid loop: one scalar multiply of the (KMAX, TB) left operand,
    # identical across variants
    scale = 1.0 + jax.lax.convert_element_type(j, jnp.float32) * 1e-9
    l_all = l_ref[...] * scale
    dw = jax.lax.dot_general(
        l_all[:k1], r_ref[0:k1, :], (((0,), (0,)), ((), ())), **_HP
    )  # (TB, P)
    if k2 is not None:
        du = jax.lax.dot_general(
            l_all[k1 : k1 + k2], r_ref[k1 : k1 + k2, :],
            (((0,), (0,)), ((), ())), **_HP,
        )
        # read both planes back, like the dd chain does
        o_ref[...] += dw * 0.5 + du * 0.25
    else:
        o_ref[...] += dw * 0.5


def make_fn(k1, k2, grid):
    kern = functools.partial(_body, grid=grid, k1=k1, k2=k2)
    call = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((KMAX, TB), lambda j: (0, 0)),
            pl.BlockSpec((KMAX, P), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TB, P), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((TB, P), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )
    return jax.jit(lambda l, r: call(l, r))


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
    # operand pool: vary the LEFT operand per call (small: 128 KB each)
    l_pool = [
        jax.device_put(jnp.asarray(
            rng.standard_normal((KMAX, TB)) * 1e-3, jnp.float32))
        for _ in range(args.calls)
    ]
    r_dev = jax.device_put(jnp.asarray(
        rng.standard_normal((KMAX, P)) * 1e-3, jnp.float32))
    jax.block_until_ready(r_dev)

    fns = {}
    for name, k1, k2 in VARIANTS:
        stage(f"compile {name}")
        fns[name] = make_fn(k1, k2, args.grid)
        _ = float(np.asarray(fns[name](l_pool[0], r_dev))[0, 0])  # warm

    def window(fn):
        t = time.perf_counter()
        for l in l_pool:
            out = fn(l, r_dev)
        _ = float(np.asarray(out)[0, 0])  # sync
        return (time.perf_counter() - t) / (args.calls * args.grid)

    times = {name: [] for name, _, _ in VARIANTS}
    for r in range(args.rounds):
        for name, _, _ in VARIANTS:  # interleaved round-robin
            times[name].append(window(fns[name]))
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
    for name, k1, k2 in VARIANTS:
        med = float(np.median(times[name]))
        flops = 2 * TB * P * (k1 + (k2 or 0))
        rec = {
            "k": [k1] + ([k2] if k2 is not None else []),
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
