"""Trace-time validation of Pallas/Mosaic alignment and capacity limits.

CI runs every Pallas test in ``interpret=True`` mode (no TPU attached),
which skips Mosaic lowering entirely — so the whole class of tile-shape /
layout / VMEM constraints would otherwise surface only on real hardware,
as obscure compile errors like ``last two dimensions of your block shape
are divisible by 8 and 128`` (the round-3 production-trainer crash at the
reference default ``BATCH_SIZE=500``, ``/root/reference/QFA/config.py:30``,
whose 4-row tile Mosaic rejected). These validators encode the constraints
explicitly at every kernel API boundary (``fused_train_epoch``,
``fused_loss_grads``, ``fused_predict``) and raise actionable errors at
trace time instead. They are unit-tested on CPU (tests/test_validate.py)
and exercised against real Mosaic lowering by ``bench.py --smoke``.

Two kinds of limits live here:

* **Hard ISA alignment** — the f32 sublane/lane granules (8, 128). A block
  whose second-minor dim is not an 8-multiple never lowers; catching it
  here is exact.
* **Measured compile ceilings** — tile sizes above which this Mosaic
  toolchain fails to *compile* the production kernels on the v5e even
  though a naive VMEM byte count still fits (layout spills). Measured:
  the epoch kernel compiles at TB=512 and fails at TB=1024 for SDSS-width
  grids (P ~ 1920); DESI-width grids (P ~ 9.3k) compile at TB=128 and
  fail at TB=256 (training *and* inference). These are encoded as the
  width-dependent :func:`max_tile_batch` ceiling.
"""

from __future__ import annotations

__all__ = [
    "SUBLANE",
    "LANE",
    "VMEM_BYTES",
    "max_tile_batch",
    "validate_tile",
    "estimate_epoch_vmem",
    "validate_epoch_kernel",
    "validate_step_kernel",
    "validate_predict_kernel",
]

#: f32 sublane granule: the second-minor dim of every VMEM block must be a
#: multiple of this to lower on TPU.
SUBLANE = 8
#: lane granule: the minor dim of every VMEM block must be a multiple.
LANE = 128
#: physical VMEM ceiling the kernels request via CompilerParams.
VMEM_BYTES = 128 * 1024 * 1024


def max_tile_batch(p_lanes: int) -> int:
    """Measured Mosaic compile ceiling for the production kernels' tiles.

    v5e, this toolchain: SDSS-width grids (P <= 4096 lanes) compile up to
    512-row tiles (1024 fails); DESI-width grids compile at 128 and fail
    at 256 — training and inference alike. 256 -> 128 is also the
    *performance* switch point (``pick_tiling`` / ``default_tile_batch``);
    the ceiling here only rejects tiles that will not compile at all.
    """
    return 128 if p_lanes > 4096 else 512


def validate_tile(
    tile_batch: int,
    *,
    p_lanes: int | None = None,
    interpret: bool = False,
    what: str = "tile_batch",
) -> None:
    """Reject tiles Mosaic cannot lower (sublane-misaligned or beyond the
    measured compile ceiling). No-op in interpret mode, where Mosaic never
    runs — mirrors the kernels' own behavior."""
    if tile_batch < 1:
        raise ValueError(f"{what} must be >= 1, got {tile_batch}")
    if interpret:
        return
    if tile_batch % SUBLANE:
        raise ValueError(
            f"{what}={tile_batch} is not a multiple of the f32 sublane "
            f"granule ({SUBLANE}): Mosaic rejects (tile, P) blocks whose "
            "second-minor dim is sublane-misaligned. Pick an 8-multiple "
            "tile and pad the batch with inert zero rows up to a tile "
            "multiple (fit_pallas / pick_tiling do this automatically for "
            "any batch size)."
        )
    if p_lanes is not None and tile_batch > max_tile_batch(p_lanes):
        raise ValueError(
            f"{what}={tile_batch} exceeds the measured Mosaic compile "
            f"ceiling of {max_tile_batch(p_lanes)} rows at P={p_lanes} "
            "lanes on the v5e (wider grids stream more bytes per tile and "
            "fail layout allocation, not the VMEM byte budget). Use "
            "pick_tiling / default_tile_batch, which stay at the measured "
            "fastest sizes (256, or 128 beyond 4096 lanes)."
        )


def _check_lane_width(p_lanes: int, what: str = "padded pixel width") -> None:
    if p_lanes % LANE:
        raise ValueError(
            f"{what} {p_lanes} is not a multiple of the lane granule "
            f"({LANE}) — pad the pixel axis first (ops.fused_step._round_up)"
        )


def estimate_epoch_vmem(
    *,
    nh: int,
    tile_batch: int,
    p_lanes: int,
    rc: int,
    n_loss_rows: int,
    streams: int,
    zq_lanes: int | None = None,
    bf16_streams: int = 0,
    wide_rows: int = 0,
) -> int:
    """Lower-bound VMEM bytes the whole-epoch kernel asks Mosaic for.

    Counts double-buffered streamed tiles, the VMEM-resident whole-array
    inputs/outputs, and the scratch allocations of
    ``ops.epoch_kernel._epoch_kernel``. A lower bound only (Mosaic adds
    layout padding and spill slots), so it REJECTS configurations that
    certainly cannot fit; the measured :func:`max_tile_batch` ceiling
    catches the layout failures the byte count cannot see.

    Args:
        streams: number of ``(tile, P)`` planes streamed per grid step
            (delta + error + zabs-plane [+ mask]).
        zq_lanes: when set, the zabs stream is the narrow zq column of
            this many lanes instead of a full plane.
        bf16_streams: how many of ``streams`` arrive as bfloat16
            (``TRAIN.BF16_PLANES`` stores delta/error at 2 bytes/elem; the
            kernel casts per-tile on read, so the streamed double buffers
            really are half-size — pricing them at 4 bytes would falsely
            reject survey-scale configurations that fit).
        wide_rows: sublane rows of the ``bwd_wide`` block-diag backward
            contraction scratch (``rc2``, 2P lanes wide); 0 when the
            two-dot backward path runs.
    """
    f32 = 4
    tile_bytes = tile_batch * p_lanes * f32
    # double-buffered pipeline; bf16 planes stream at half the bytes
    streamed = 2 * (streams - bf16_streams) * tile_bytes
    streamed += 2 * bf16_streams * (tile_bytes // 2)
    if zq_lanes is not None:
        streamed += 2 * tile_batch * zq_lanes * f32
    whole_in = (3 * nh + 8 + 1 + 1) * p_lanes * f32  # ft/mft/vft, rows, blue, loglam
    outs = (3 * nh + 8) * p_lanes * f32 + n_loss_rows * LANE * f32
    scratch = (2 * rc + 2 * nh + 2 * 8) * p_lanes * f32 + LANE * f32
    scratch += wide_rows * 2 * p_lanes * f32  # bwd_wide (rc2, 2P) rhs
    return streamed + whole_in + outs + scratch


def validate_epoch_kernel(
    *,
    nh: int,
    tile_batch: int,
    p_lanes: int,
    rc: int,
    n_batches: int,
    n_epochs: int,
    streams: int,
    zq_lanes: int | None = None,
    bf16_streams: int = 0,
    wide_rows: int = 0,
    interpret: bool = False,
) -> None:
    """API-boundary guard for ``ops.epoch_kernel.fused_train_epoch``."""
    validate_tile(
        tile_batch, p_lanes=p_lanes, interpret=interpret,
        what="fused_train_epoch tile_batch",
    )
    if interpret:
        return
    _check_lane_width(p_lanes)
    if zq_lanes is not None and zq_lanes % LANE:
        raise ValueError(
            f"zq column width {zq_lanes} is not a lane multiple ({LANE})"
        )
    need = estimate_epoch_vmem(
        nh=nh, tile_batch=tile_batch, p_lanes=p_lanes, rc=rc,
        n_loss_rows=n_epochs * n_batches, streams=streams, zq_lanes=zq_lanes,
        bf16_streams=bf16_streams, wide_rows=wide_rows,
    )
    if need > VMEM_BYTES:
        raise ValueError(
            f"fused_train_epoch needs >= {need / 2**20:.0f} MiB of VMEM "
            f"(tile {tile_batch} x {p_lanes} lanes, {streams} streamed "
            f"planes, {n_epochs}x{n_batches} loss rows) but the chip has "
            f"{VMEM_BYTES / 2**20:.0f} MiB — shrink the tile "
            "(pick_tiling), chunk fewer epochs per launch, or train more/"
            "smaller batches per epoch"
        )


def validate_step_kernel(
    *,
    tile_batch: int,
    p_lanes: int,
    interpret: bool = False,
) -> None:
    """API-boundary guard for ``ops.fused_step.fused_loss_grads``."""
    validate_tile(
        tile_batch, p_lanes=p_lanes, interpret=interpret,
        what="fused_loss_grads tile_batch",
    )
    if not interpret:
        _check_lane_width(p_lanes)


def validate_predict_kernel(
    *,
    tile_batch: int,
    p_lanes: int,
    n_rows: int | None = None,
    interpret: bool = False,
) -> None:
    """API-boundary guard for ``ops.infer_kernel.fused_predict``.

    Beyond the shared tile rules, the prediction kernel writes its
    per-spectrum stats LANE-major — the ``(rows, tile)`` output block puts
    the tile on the LANE (minor) dim, which Mosaic only lowers when it is
    a 128-multiple or spans the whole spectrum axis (found by the
    bench.py --smoke lowering check: tile 8 compiled nowhere on hardware
    even though the (tile, P) input blocks were legal).
    """
    validate_tile(
        tile_batch, p_lanes=p_lanes, interpret=interpret,
        what="fused_predict tile_batch",
    )
    if interpret:
        return
    _check_lane_width(p_lanes)
    if tile_batch % LANE and (n_rows is None or tile_batch != n_rows):
        raise ValueError(
            f"fused_predict tile_batch={tile_batch} must be a multiple of "
            f"the lane granule ({LANE}) — or equal to the full spectrum "
            f"count{'' if n_rows is None else f' ({n_rows})'} — because "
            "the per-spectrum stats output is lane-major (spectra on "
            "lanes); Mosaic rejects other minor-dim block widths. Use "
            "default_tile_batch (128/256) and pad N to a tile multiple."
        )
