"""Measured per-section census of the whole-epoch kernel (VERDICT r4 #1a).

The round 2-4 binding model priced the kernel's VPU work with a
STATEMENT-WALK op count (bench.kernel_vpu_ops_per_spectrum) — an admitted
upper bound, since Mosaic fuses cmp+select, mul+add pairs and elides
concat copies. This tool replaces that bound with HARDWARE MEASUREMENTS:
each kernel section (qfa_tpu.ops.epoch_kernel.ABLATE_SECTIONS) is stubbed
out with shape-preserving constants and the per-epoch time delta against
the full kernel — interleaved in the same congestion window, median of
pairs — is measured. CAVEAT: removal-arm deltas are NOT additive — a
stub also DCEs anything it was the only consumer of (the gsums arm
deletes the whole backward chain), so cross-section attribution must use
the ADDITIVE `xsums` arm (extra reductions on top of the full kernel;
its marginal slowdown is the DCE-proof reduction price) or same-window
differences of arms that DCE the same code (gsums - bwd). Alongside, it
measures

* the per-epoch NON-KERNEL overhead of the production chunk path
  (permutation generation + state pack/unpack kernels): direct launches
  with host-precomputed permutations vs make_pallas_chunk_fn;
* the per-grid-step fixed overhead: the full kernel timed at tile 128 vs
  256 (double the grid steps over identical bytes/flops).

Run on the real TPU from the repo root:
    python tools/vpu_census.py [--epochs-per-window N] [--rounds K]
Writes the full record to docs/CENSUS_r05.json and a summary to stdout.

Measurement discipline (CLAUDE.md): inputs vary every call, state chains
through calls, one host sync closes each window, sections interleave with
the full kernel so tunnel congestion cancels in the pair delta.
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

import bench  # noqa: E402  (repo-root bench.py: problem builder + calibrators)
from qfa_tpu.ops import loglam_row  # noqa: E402
from qfa_tpu.ops.epoch_kernel import (  # noqa: E402
    ABLATE_SECTIONS,
    fused_train_epoch,
)

N_SPECTRA = 65536
BATCH = 4096
TILE = 256
NH = 8
EPL = 5  # epochs per launch (production fused-5 cadence)


def stage(msg):
    print(f"[census +{time.perf_counter() - T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


T0 = time.perf_counter()


def make_direct_fn(loglam, *, tile=TILE, ablate=(), mxu_bf16=False,
                   bwd_wide=False):
    """Jitted direct launch: (params, m, v, data, perms, epoch) -> outputs.

    Permutations arrive as an INPUT (host-precomputed), so the jit body is
    the pallas launch plus the kernel's own small packing ops — the
    difference vs the production chunk fn is exactly the in-jit
    permutation generation the chunk path pays per epoch. The data planes
    are ARGUMENTS, never closures: this backend embeds jit closures as
    constants in the remote-compile request (HTTP 413 over ~100 MB).
    """

    @jax.jit
    def fn(params, m, v, data, perms, epoch):
        return fused_train_epoch(
            params, m, v, data.delta, data.error, data.zabs, perms, None,
            epoch=epoch, n_batches=N_SPECTRA // BATCH, n_epochs=EPL,
            loglam=loglam, derive_zabs=True, tile_batch=tile,
            mxu_bf16=mxu_bf16, bwd_wide=bwd_wide, ablate=ablate,
        )

    return fn


def run_window(fn, data, state, calls, seed, tile=TILE):
    """Chained launches; one sync closes the window. Returns (dt, state).

    All per-call tile permutations are staged on device BEFORE the clock
    starts — an in-window host->device transfer would add a tunnel round
    trip per call and measure the link, not the kernel.
    """
    params, m, v, epoch = state
    rng = np.random.default_rng(seed)
    n_tiles = N_SPECTRA // tile
    perm_pool = [
        jax.device_put(jnp.asarray(
            np.stack([rng.permutation(n_tiles) for _ in range(EPL)]),
            jnp.int32,
        ))
        for _ in range(calls)
    ]
    jax.block_until_ready(perm_pool[-1])
    t0 = time.perf_counter()
    for perms in perm_pool:
        out = fn(params, m, v, data, perms, epoch)
        params, m, v = out.params, out.m, out.v
        epoch = epoch + EPL
    _ = float(np.asarray(out.loss_sums)[-1, -1])  # sync
    return time.perf_counter() - t0, (params, m, v, epoch)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--calls", type=int, default=10,
                    help="launches per timing window (x5 epochs each)")
    ap.add_argument("--rounds", type=int, default=5,
                    help="interleaved (full, ablated) pairs per section")
    ap.add_argument("--skip-calibration", action="store_true")
    ap.add_argument("--sections", type=str, default=None,
                    help="comma-separated subset of ABLATE_SECTIONS; a "
                         "targeted run MERGES its measurements into the "
                         "existing docs/CENSUS_r05.json instead of "
                         "rewriting it, and skips the floor/grid/chunk "
                         "stages")
    args = ap.parse_args()
    # dwdot/dudot split bwddots per-dot — targeted-run only (a full run
    # would triple-count the backward dots: bwddots already covers the
    # pair, and the gsums removal arm DCEs them yet again)
    default_sections = tuple(
        s for s in ABLATE_SECTIONS if s not in ("dwdot", "dudot")
    )
    sections = (tuple(args.sections.split(","))
                if args.sections else default_sections)
    bad = set(sections) - set(ABLATE_SECTIONS)
    if bad:
        raise SystemExit(f"unknown sections {sorted(bad)}")

    import qfa_tpu

    grid = qfa_tpu.make_grid()
    stage("building 65k problem")
    params, mu, syn, data, _plane = bench.make_problem(grid, NH, N_SPECTRA)
    llrow = loglam_row(grid.wav)
    zeros = jax.tree.map(jnp.zeros_like, params)
    p = data.delta.shape[1]
    pb = 768  # round_up(nb=720, 128)

    # ---- calibrated peaks (for the predicted-side of the table) ----------
    vpu = mxu_tflops = None
    if not args.skip_calibration:
        stage("vpu calibration")
        vpu = bench.calibrate_vpu()
        stage("mxu calibration")
        mxu_tflops, _bf16, _rd = bench.calibrate_peaks()

    # ---- statement-walk predictions per section ---------------------------
    # (the very counts bench.kernel_vpu_ops_per_spectrum aggregates, split
    # by ablation section; see that function's docstring for the tally)
    # NOTE on stub DCE: a stub that stops USING an MXU dot's output lets
    # the compiler delete the dot, so that section's measured delta
    # includes the dot's MXU time — the "mxu" key prices that in.
    ntri = NH * (NH + 1) // 2
    pred_ops = {
        "tau": dict(simple=11 * pb, exp=4 * pb),
        # stub keeps err*err + 1.0 (2P) and the d_safe/dinv chain; removes
        # base_r(2P) + d concat(1P) + w/u concats(2P) + blue d/w/u (10PB)
        # + red u (P-PB)
        "fwd": dict(simple=3 * p + 10 * pb + (p - pb)),
        "qlog": dict(simple=2 * p, log=p),
        # dd chain (8P) + blue backward elementwise incl. dpsi concat
        # (7PB); dd = m also DCEs the dw_pix/du_pix backward
        # contractions (2(ntri+nh)P flops)
        "bwd": dict(simple=8 * p + 7 * pb, mxu=2 * (ntri + NH) * p),
        # ONLY the two backward contractions (+ output relayout, if any)
        "bwddots": dict(mxu=2 * (ntri + NH) * p),
        # per-dot splits of bwddots (KDEPTH_r05 showed the dots pay a
        # K-flat fixed pass cost standalone; these measure each dot's
        # in-kernel marginal)
        "dwdot": dict(mxu=2 * ntri * p),
        "dudot": dict(mxu=2 * NH * p),
        # REMOVAL arm, confounded by DCE: the six grows_scr sums are the
        # ONLY consumers of the dd cotangent chain, so stubbing them out
        # lets the compiler delete the whole backward chain (8P + 7PB
        # elementwise) AND the dw/du dots along with the operand
        # products (3PB) and reductions (2P + 4PB) themselves. The
        # prediction prices ALL of that; the reduction-only cost is the
        # `xsums` arm below (or gsums_minus_bwd: both arms DCE the same
        # backward chain, so the difference is products + reductions)
        "gsums": dict(simple=(3 * pb + 2 * p + 4 * pb) + (8 * p + 7 * pb),
                      mxu=2 * (ntri + NH) * p),
        # ADDITIVE arm: six EXTRA sublane reductions over alive planes
        # (4 full-width + 2 blue) — the marginal slowdown is the
        # DCE-proof direct measurement of sublane-reduction cost
        "xsums": dict(simple=4 * p + 2 * pb),
        "small": dict(simple=int(2.3 * NH**3) * 8),
        "epi": dict(simple=0),  # per-batch, not per-spectrum: no walk pred
    }

    def predict_ns(ops):
        if vpu is None or any(v is None for v in vpu.values()):
            return None
        t = ops.get("simple", 0) / vpu["fma"]
        t += ops.get("exp", 0) / vpu["exp"]
        t += ops.get("log", 0) / vpu["log"]
        if mxu_tflops:
            t += ops.get("mxu", 0) / (mxu_tflops * 1e12)
        return round(t * 1e9, 2)

    # ---- per-section measured deltas --------------------------------------
    full_fn = make_direct_fn(llrow)
    state0 = (params, zeros, zeros, jnp.asarray(0, jnp.int32))
    stage("compile full kernel")
    _, state = run_window(full_fn, data, state0, 1, 0)  # compile + warm

    epochs_per_window = args.calls * EPL
    results = {}
    full_times = []
    for sec in sections:
        stage(f"section {sec}: compile")
        abl_fn = make_direct_fn(llrow, ablate=(sec,))
        _, _ = run_window(abl_fn, data, state0, 1, 1)  # compile + warm
        deltas, fulls = [], []
        for r in range(args.rounds):
            tf, state = run_window(full_fn, data, state, args.calls,
                                   100 + r)
            ta, _ = run_window(abl_fn, data, state0, args.calls, 200 + r)
            # xsums is the ADDITIVE arm: the ablated kernel is the full
            # kernel PLUS six extra reductions, so its cost is ta - tf
            signed = (ta - tf) if sec == "xsums" else (tf - ta)
            deltas.append(signed / epochs_per_window / N_SPECTRA)
            fulls.append(tf / epochs_per_window / N_SPECTRA)
        med = float(np.median(deltas))
        results[sec] = {
            "measured_ns_per_spectrum": round(med * 1e9, 2),
            "predicted_ns_per_spectrum": predict_ns(pred_ops[sec]),
            "pair_deltas_ns": [round(d * 1e9, 2) for d in sorted(deltas)],
        }
        full_times.extend(fulls)
        stage(f"section {sec}: measured {med * 1e9:.2f} ns/spectrum "
              f"(pred {results[sec]['predicted_ns_per_spectrum']})")

    t_full_ns = float(np.median(full_times)) * 1e9

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "CENSUS_r05.json")

    if args.sections is not None:
        # targeted run: merge the new sections + this window's t_full into
        # the existing record (keeps the full run's floor/grid/chunk data)
        with open(out_path) as fh:
            record = json.load(fh)
        record["sections"].update(results)
        record.setdefault("targeted_runs", {})[args.sections] = {
            "t_full_ns_per_spectrum": round(t_full_ns, 2),
            "epochs_per_window": epochs_per_window,
            "rounds": args.rounds,
        }
        secs = record["sections"]
        if {"gsums", "bwd"} <= set(secs):
            # both removal arms DCE the same backward chain, so the
            # difference isolates the operand products + reductions
            record["gsums_minus_bwd_ns"] = round(
                secs["gsums"]["measured_ns_per_spectrum"]
                - secs["bwd"]["measured_ns_per_spectrum"], 2)
        with open(out_path, "w") as fh:
            json.dump(record, fh, indent=1)
        print(json.dumps(
            {"t_full_ns_per_spectrum": round(t_full_ns, 2),
             "sections": results}, indent=1))
        return

    # ---- all-VPU floor: every VPU-ablatable section off at once ----------
    # (xsums is additive-only and the per-dot splits are covered by
    # bwddots — the floor arm is every REMOVAL section at once)
    stage("all-sections floor: compile")
    floor_fn = make_direct_fn(
        llrow,
        ablate=tuple(s for s in ABLATE_SECTIONS
                     if s not in ("xsums", "dwdot", "dudot")),
    )
    _, _ = run_window(floor_fn, data, state0, 1, 2)
    floor_deltas = []
    for r in range(args.rounds):
        tf, state = run_window(full_fn, data, state, args.calls, 300 + r)
        ta, _ = run_window(floor_fn, data, state0, args.calls, 400 + r)
        floor_deltas.append((tf - ta) / epochs_per_window / N_SPECTRA)
    floor_ns = float(np.median(floor_deltas)) * 1e9

    # ---- grid-step overhead: tile 128 doubles the steps -------------------
    stage("tile-128 variant: compile")
    t128_fn = make_direct_fn(llrow, tile=128)
    _, _ = run_window(t128_fn, data, state0, 1, 3, tile=128)
    step_deltas = []
    for r in range(3):
        tf, state = run_window(full_fn, data, state, args.calls, 500 + r)
        ta, _ = run_window(t128_fn, data, state0, args.calls, 600 + r, tile=128)
        # tile 128 runs one EXTRA grid step per 256 spectra
        step_deltas.append((ta - tf) / epochs_per_window / (N_SPECTRA / 256))
    step_us = float(np.median(step_deltas)) * 1e6

    # ---- production chunk path vs direct launches -------------------------
    # (the chunk fn generates its permutations in-jit: extra small kernels)
    stage("production chunk path")
    from qfa_tpu.train import TrainConfig, TrainState, adam
    from qfa_tpu.train.pallas_engine import make_pallas_chunk_fn

    cf = make_pallas_chunk_fn(
        TrainConfig(batch_size=BATCH), n_epochs=EPL, tile_batch=TILE,
        derive_mask=True, loglam=llrow,
    )
    st = TrainState(params, adam.init(params))
    st, lv = cf(st, data, jax.random.key(900))
    _ = float(lv[-1])
    chunk_deltas = []
    for r in range(3):
        t0 = time.perf_counter()
        for k in range(args.calls):
            st, lv = cf(st, data, jax.random.key(901 + args.calls * r + k))
        _ = float(lv[-1])
        tc = time.perf_counter() - t0
        tf, state = run_window(full_fn, data, state, args.calls, 700 + r)
        chunk_deltas.append((tc - tf) / epochs_per_window)
    chunk_overhead_us = float(np.median(chunk_deltas)) * 1e6

    measured_sum = sum(
        results[s]["measured_ns_per_spectrum"] for s in sections
        if s != "xsums"  # additive arm, not a component of t_full
    )
    record = {
        "what": "measured per-section census of the whole-epoch kernel "
                "(65k SDSS, fused-5 cadence, f32 engine)",
        "t_full_ns_per_spectrum": round(t_full_ns, 2),
        "sections": results,
        "sections_measured_sum_ns": round(measured_sum, 2),
        "sections_sum_note": "removal-arm deltas are NOT additive: "
            "stubbing a section also DCEs anything whose only consumer "
            "it was (bwd deletes the dw/du dots; gsums deletes the "
            "entire backward chain), so overlapping sections double- "
            "count and the sum exceeds t_full. Reduction-only cost = "
            "the xsums additive arm (or gsums - bwd, same backward "
            "chain DCE'd in both).",
        **(
            {"gsums_minus_bwd_ns": round(
                results["gsums"]["measured_ns_per_spectrum"]
                - results["bwd"]["measured_ns_per_spectrum"], 2)}
            if {"gsums", "bwd"} <= set(results) else {}
        ),
        "all_vpu_sections_floor_delta_ns": round(floor_ns, 2),
        "grid_step_overhead_us": round(step_us, 2),
        "chunk_vs_direct_overhead_us_per_epoch": round(chunk_overhead_us, 1),
        "vpu_peaks_tops": None if vpu is None else {
            k: None if v is None else round(v / 1e12, 3)
            for k, v in vpu.items()
        },
        "mxu_peak_tflops_f32": None if mxu_tflops is None
        else round(mxu_tflops, 2),
        "epochs_per_window": epochs_per_window,
        "rounds": args.rounds,
    }
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "CENSUS_r05.json")
    with open(out_path, "w") as fh:
        json.dump(record, fh, indent=1)
    print(json.dumps(record, indent=1))


if __name__ == "__main__":
    main()
