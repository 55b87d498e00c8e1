"""In-kernel A/B of the fused backward contraction (``bwd_wide``).

docs/CENSUS_r05.json measured the two backward cotangent dots at 14.7 +
15.4 ns/spectrum — additive, K-flat (each pays the same fixed issue
cost) — and the standalone wide44 probe (docs/KDEPTH_r05.json) showed a
(TB, 2P)-output K=44 block-diag dot costs the same as a single (TB, P)
dot. This script answers the only remaining question: does the fused
single-dot backward beat the two-dot backward INSIDE the production
kernel on hardware, for both engines?

Methodology per CLAUDE.md: fused-5 direct launches on the 65k problem,
variants interleaved round-robin in the same congestion window, state
chained through calls, one host pull per window, pair medians. Also
asserts the two paths' final losses agree (hardware numerics check; the
paths are bitwise-equal in interpret mode, pinned in
tests/test_epoch_kernel.py).

Run on the real TPU from the repo root:
    python tools/bwd_wide_ab.py [--rounds K] [--calls N]
Writes docs/BWDWIDE_r05.json and a summary to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from qfa_tpu.ops import loglam_row  # noqa: E402
from vpu_census import (  # noqa: E402
    EPL,
    N_SPECTRA,
    make_direct_fn,
    run_window,
)

T0 = time.perf_counter()


def stage(msg):
    print(f"[bwdab +{time.perf_counter() - T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--calls", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()

    import qfa_tpu

    grid = qfa_tpu.make_grid()
    stage("building 65k problem")
    params, mu, syn, data, _plane = bench.make_problem(grid, 8, N_SPECTRA)
    llrow = loglam_row(grid.wav)
    zeros = jax.tree.map(jnp.zeros_like, params)
    state0 = (params, zeros, zeros, jnp.asarray(0, jnp.int32))

    variants = {
        "f32_twodot": dict(),
        "f32_wide": dict(bwd_wide=True),
        "bf16_twodot": dict(mxu_bf16=True),
        "bf16_wide": dict(mxu_bf16=True, bwd_wide=True),
    }
    fns, states, losses = {}, {}, {}
    for name, kw in variants.items():
        stage(f"compile {name}")
        fns[name] = make_direct_fn(llrow, **kw)
        _, states[name] = run_window(fns[name], data, state0, 1, 0)

    times = {name: [] for name in variants}
    epw = args.calls * EPL
    for r in range(args.rounds):
        for name in variants:  # interleaved round-robin
            t, states[name] = run_window(
                fns[name], data, states[name], args.calls, 100 + r
            )
            times[name].append(t / epw / N_SPECTRA)
        stage(f"round {r + 1}/{args.rounds} done")

    # hardware numerics check: identical shuffle seeds were fed to every
    # variant, so the chained final params must agree within each engine
    # (bitwise if Mosaic preserves the zero-block accumulation order).
    # ASSERTED, not just recorded — a silent hardware divergence here
    # would invalidate the bitwise-identity claim the flag ships with.
    for eng in ("f32", "bf16"):
        a = states[f"{eng}_twodot"][0]
        b = states[f"{eng}_wide"][0]
        for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            rel = float(
                jnp.max(jnp.abs(la - lb))
                / (jnp.max(jnp.abs(la)) + 1e-30)
            )
            losses[f"{eng}_max_param_rel_diff"] = max(
                losses.get(f"{eng}_max_param_rel_diff", 0.0), rel
            )
        if losses[f"{eng}_max_param_rel_diff"] > 1e-6:
            raise AssertionError(
                f"{eng}: bwd_wide params diverged from the two-dot path "
                f"on hardware (max rel diff "
                f"{losses[f'{eng}_max_param_rel_diff']:.3e} > 1e-6) — "
                "the bitwise-identity claim does not hold on this "
                "toolchain"
            )

    record = {
        "what": "in-kernel A/B of bwd_wide (fused single backward "
                "contraction) vs the two-dot backward, fused-5 direct "
                "launches, 65k SDSS, interleaved windows",
        "ns_per_spectrum": {
            name: round(float(np.median(ts)) * 1e9, 2)
            for name, ts in times.items()
        },
        "samples_ns": {
            name: [round(t * 1e9, 2) for t in sorted(ts)]
            for name, ts in times.items()
        },
        **{k: v for k, v in losses.items()},
        "epochs_per_window": epw,
        "rounds": args.rounds,
    }
    record["wide_vs_twodot_f32"] = round(
        record["ns_per_spectrum"]["f32_wide"]
        / record["ns_per_spectrum"]["f32_twodot"], 3
    )
    record["wide_vs_twodot_bf16"] = round(
        record["ns_per_spectrum"]["bf16_wide"]
        / record["ns_per_spectrum"]["bf16_twodot"], 3
    )
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "BWDWIDE_r05.json")
    with open(out, "w") as fh:
        json.dump(record, fh, indent=1)
    print(json.dumps(record, indent=1))


if __name__ == "__main__":
    main()
