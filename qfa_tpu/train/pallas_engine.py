"""Production trainer backed by the whole-epoch Pallas kernel.

``fit()`` (the XLA scan trainer) dispatches one fused program per epoch
whose ~7-9 kernels per batch each pay the device's fixed launch cost —
the measured throughput ceiling on the target v5e. This engine drives
``ops.epoch_kernel.fused_train_epoch`` instead: ONE kernel per epoch,
parameters and Adam moments resident in VMEM/SMEM for the whole launch,
batch tiles streamed from HBM by the Pallas pipeline.

Epoch-boundary semantics mirror :func:`qfa_tpu.train.loop.fit`
(reference ``/root/reference/QFA/model.py:183-231``): per-epoch Adam
counter, periodic smoothing + checkpointing, negative-loss early stop,
full-state resume. Shuffling is tile-granular (the kernel regroups
random ``tile_batch``-row tiles into batches every epoch); pass
``reshuffle_interval`` to additionally re-permute the resident rows
physically every K epochs for row-level mixing.
"""

from __future__ import annotations

import logging
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import ResidualDataset
from ..models.params import QFAParams, save_npz, smooth_params
from ..ops.epoch_kernel import fused_train_epoch
from . import adam
from .loop import TrainConfig, TrainState, reshuffle_dataset

__all__ = [
    "make_pallas_epoch_fn",
    "make_pallas_chunk_fn",
    "pallas_train_epoch",
    "fit_pallas",
    "pick_tile_batch",
    "pick_divisor_tile",
    "pick_tiling",
]

#: measured per-grid-step fixed overhead of the epoch kernel (us, v5e).
_GRID_STEP_US = 2.2
#: measured per-row compute time at the SDSS width (us/row, v5e) — scaled
#: linearly with the lane count for other grids.
_ROW_US_SDSS = 0.11


def pick_tiling(
    batch_size: int, npix: int, limit: int = 256
) -> tuple[int, int]:
    """Sublane-aligned tile + padded per-update row count for a batch size.

    Returns ``(tile_batch, batch_rows)`` with ``tile_batch`` a multiple of
    the 8-row f32 sublane granule (Mosaic rejects smaller/misaligned tile
    blocks outright — the round-3 crash at the reference default
    ``BATCH_SIZE=500``, whose largest power-of-two divisor is 4) and
    ``batch_rows = ceil(batch_size / tile_batch) * tile_batch`` the rows
    each optimizer update actually spans. When ``batch_rows >
    batch_size``, callers pad the dataset with inert zero rows (weight 0 /
    fully masked), which contribute nothing to gradients, counts, or the
    loss bookkeeping — ``fit_pallas`` does this automatically.

    Tile choice: 256 rows at SDSS width, 128 beyond 4096 lanes (DESI) —
    the measured fastest compiling sizes. Every batch size runs the
    measured cost model ``grid_steps * 2.2us + padded_rows * row_time``
    over power-of-two tiles in [8, limit]; exact-divisor tilings are
    candidates with zero padding and win whenever their step count is
    competitive (e.g. 500 -> (256, 512): 2.4% inert-row waste beats 63
    sublane-narrow grid steps by ~25x; 504 -> (256, 512), NOT its largest
    power-of-two divisor 8, which would cost 63 grid steps). Ties go to
    the smaller tile (least padding, least resident-memory growth).
    """
    if npix > 4000:
        limit = min(limit, 128)
    row_us = _ROW_US_SDSS * max(npix, 128) / 1920.0
    best_tb, best_cost = 8, None
    tb = 8
    while tb <= limit:
        steps = -(-batch_size // tb)
        cost = steps * _GRID_STEP_US + (steps * tb - batch_size) * row_us
        if best_cost is None or cost < best_cost:
            best_tb, best_cost = tb, cost
        tb *= 2
    return best_tb, -(-batch_size // best_tb) * best_tb


def pick_divisor_tile(rows: int, npix: int, limit: int = 256) -> int:
    """Largest power-of-two tile that exactly DIVIDES ``rows`` (VMEM
    limit-capped: 256 at SDSS width, 128 at DESI).

    For layers with no batch-padding machinery of their own
    (``parallel.epoch_dp`` / ``parallel.sync_dp`` resolving a default tile
    for an already-padded local window): :func:`pick_tiling` may prefer a
    padded window wider than the rows it was asked about, which those
    layers cannot honor. Returns 1/2/4 for sublane-misaligned row counts —
    callers' alignment validation turns that into their own clear error.
    """
    if npix > 4000:
        limit = min(limit, 128)
    tb = 1
    while tb * 2 <= limit and rows % (tb * 2) == 0:
        tb *= 2
    return tb


def pick_tile_batch(batch_size: int, npix: int, limit: int = 256) -> int:
    """Sublane-aligned VMEM-safe tile for ``batch_size``-row batches.

    The tile of :func:`pick_tiling`; it no longer necessarily divides the
    batch — callers must pad batches up to ``pick_tiling``'s
    ``batch_rows`` with inert rows (``fit_pallas`` and
    ``ops.fused_step.fused_loss_grads`` do so automatically).
    """
    return pick_tiling(batch_size, npix, limit)[0]


#: Bounded LRU of jitted epoch functions: a long-lived process training
#: across many dataset sizes/grids must not retain one compiled executable
#: per distinct (config, loglam, n_real) forever (ADVICE r2).
from collections import OrderedDict

_EPOCH_FN_CACHE: OrderedDict = OrderedDict()
_EPOCH_FN_CACHE_MAX = 8


def make_pallas_epoch_fn(
    config: TrainConfig,
    *,
    tile_batch: int,
    batch_rows: int | None = None,
    derive_mask: bool = False,
    loglam=None,
    n_real: int | None = None,
    interpret: bool = False,
):
    """Jitted single-dispatch epoch: ``(state, data, key) -> (state, loss)``.

    The tile-permutation draw, the whole-epoch kernel and the loss
    bookkeeping all live inside ONE jit — a per-epoch
    ``jax.random.permutation`` outside would cost a second dispatch, which
    on the tunneled device is comparable to the epoch itself. The returned
    loss is a device scalar (no host sync): chained epochs pipeline
    back-to-back.

    Passing ``loglam`` (the static ``log(lam/lam_lya)`` row,
    :func:`qfa_tpu.ops.loglam_row`) switches the kernel to derive the
    absorber redshifts in-kernel — ``data.zabs`` must then be the
    ``(N, 128)`` :func:`qfa_tpu.ops.zq_column` buffer instead of the
    ``(N, Npix)`` zabs plane (a ~15x footprint/traffic cut for that array).

    ``batch_rows`` is the PADDED per-update row count (``pick_tiling``'s
    second output, a ``tile_batch`` multiple): when the configured batch
    size has no sublane-aligned power-of-two divisor (e.g. the reference
    default 500), each batch spans ``batch_rows`` dataset rows of which
    the inert padding contributes nothing; the loss bookkeeping still
    divides by the REAL batch size. Defaults to ``config.batch_size``.
    """
    loglam_key = None if loglam is None else np.asarray(loglam).tobytes()
    cache_key = (config, tile_batch, batch_rows, derive_mask, loglam_key,
                 n_real, interpret)
    fn = _EPOCH_FN_CACHE.get(cache_key)
    if fn is not None:
        _EPOCH_FN_CACHE.move_to_end(cache_key)
        return fn
    tb = tile_batch
    b = config.batch_size
    br = batch_rows or b

    @jax.jit
    def epoch_fn(state: TrainState, data: ResidualDataset, key: jax.Array):
        n = data.delta.shape[0]
        perm = jax.random.permutation(key, n // tb)
        out = fused_train_epoch(
            state.params,
            state.opt_state.m,
            state.opt_state.v,
            data.delta,
            data.error,
            data.zabs,
            perm,
            None if derive_mask else data.mask,
            epoch=state.opt_state.epoch,
            n_batches=n // br,
            loglam=loglam,
            derive_zabs=loglam is not None,
            tile_batch=tb,
            learning_rate=config.learning_rate,
            weight_decay=config.weight_decay,
            decay_alpha=config.decay_alpha,
            decay_step=config.decay_step,
            b1=config.b1,
            b2=config.b2,
            eps=config.eps,
            bounds=config.bounds,
            tau_which=config.options.tau_which,
            reference_norm=config.reference_norm,
            mxu_bf16=config.mxu_bf16,
            bwd_wide=config.bwd_wide,
            interpret=interpret,
        )
        new_state = TrainState(
            out.params,
            adam.AdamState(
                m=out.m, v=out.v, epoch=state.opt_state.epoch + 1
            ),
        )
        # reference epoch-loss bookkeeping: sum of batch means over
        # floor(N_real / B) (/root/reference/QFA/model.py:206-213) — the
        # PADDED batch count would silently rescale the loss curve vs the
        # XLA engine whenever the dataset is not a batch multiple
        n_total = n if n_real is None else n_real
        batch_means = out.loss_sums / jnp.maximum(out.n_real, 1.0)
        return new_state, jnp.sum(batch_means) / max(n_total // b, 1)

    _EPOCH_FN_CACHE[cache_key] = epoch_fn
    while len(_EPOCH_FN_CACHE) > _EPOCH_FN_CACHE_MAX:
        _EPOCH_FN_CACHE.popitem(last=False)
    return epoch_fn


def make_pallas_chunk_fn(
    config: TrainConfig,
    *,
    n_epochs: int,
    tile_batch: int,
    batch_rows: int | None = None,
    derive_mask: bool = False,
    loglam=None,
    n_real: int | None = None,
    interpret: bool = False,
):
    """Jitted MULTI-epoch dispatch: ``(state, data, base_key) ->
    (state, losses[n_epochs])``.

    One ``pallas_call`` executes ``n_epochs`` full epochs back to back
    with parameters and Adam moments resident in on-chip scratch the
    whole time — amortizing the device's fixed per-dispatch cost and the
    per-epoch packing/permutation kernels over the chunk (the measured
    remaining overhead of the single-epoch cadence; a ``lax.scan`` around
    the kernel does NOT achieve this, it still launches per iteration).

    Unlike :func:`make_pallas_epoch_fn`, the key argument is the run's
    BASE key: epoch ``e`` of the chunk shuffles with
    ``fold_in(base_key, state.epoch + e)`` — bit-identical to the
    per-epoch subkeys :func:`fit_pallas` derives, so chunked and
    unchunked runs follow the same trajectory.
    """
    loglam_key = None if loglam is None else np.asarray(loglam).tobytes()
    cache_key = ("chunk", config, n_epochs, tile_batch, batch_rows,
                 derive_mask, loglam_key, n_real, interpret)
    fn = _EPOCH_FN_CACHE.get(cache_key)
    if fn is not None:
        _EPOCH_FN_CACHE.move_to_end(cache_key)
        return fn
    tb = tile_batch
    b = config.batch_size
    br = batch_rows or b

    @jax.jit
    def chunk_fn(state: TrainState, data: ResidualDataset, key: jax.Array):
        n = data.delta.shape[0]
        n_tiles = n // tb
        ep0 = state.opt_state.epoch
        subs = jax.vmap(lambda k: jax.random.fold_in(key, k))(
            ep0 + jnp.arange(n_epochs)
        )
        perms = jax.vmap(
            lambda k: jax.random.permutation(k, n_tiles)
        )(subs)
        out = fused_train_epoch(
            state.params,
            state.opt_state.m,
            state.opt_state.v,
            data.delta,
            data.error,
            data.zabs,
            perms,
            None if derive_mask else data.mask,
            epoch=ep0,
            n_batches=n // br,
            n_epochs=n_epochs,
            loglam=loglam,
            derive_zabs=loglam is not None,
            tile_batch=tb,
            learning_rate=config.learning_rate,
            weight_decay=config.weight_decay,
            decay_alpha=config.decay_alpha,
            decay_step=config.decay_step,
            b1=config.b1,
            b2=config.b2,
            eps=config.eps,
            bounds=config.bounds,
            tau_which=config.options.tau_which,
            reference_norm=config.reference_norm,
            mxu_bf16=config.mxu_bf16,
            bwd_wide=config.bwd_wide,
            interpret=interpret,
        )
        new_state = TrainState(
            out.params,
            adam.AdamState(m=out.m, v=out.v, epoch=ep0 + n_epochs),
        )
        n_total = n if n_real is None else n_real
        loss_sums = out.loss_sums.reshape(n_epochs, -1)
        reals = out.n_real.reshape(n_epochs, -1)
        batch_means = loss_sums / jnp.maximum(reals, 1.0)
        losses = jnp.sum(batch_means, axis=1) / max(n_total // b, 1)
        return new_state, losses

    _EPOCH_FN_CACHE[cache_key] = chunk_fn
    while len(_EPOCH_FN_CACHE) > _EPOCH_FN_CACHE_MAX:
        _EPOCH_FN_CACHE.popitem(last=False)
    return chunk_fn


def pallas_train_epoch(
    state: TrainState,
    data: ResidualDataset,
    key: jax.Array,
    config: TrainConfig,
    *,
    tile_batch: int | None = None,
    batch_rows: int | None = None,
    interpret: bool = False,
    derive_mask: bool = False,
    loglam=None,
    n_real: int | None = None,
) -> tuple[TrainState, float]:
    """One full training epoch in a single kernel launch.

    ``data.size`` must be a whole number of per-update batch windows: with
    a batch size the tile divides that is ``config.batch_size`` itself;
    otherwise each update spans ``pick_tiling``'s padded ``batch_rows``
    (e.g. 512 dataset rows per 500-row batch at the reference default) and
    the dataset must be padded with inert zero rows accordingly —
    :func:`fit_pallas` does all of this automatically. Pass ``batch_rows``
    together with ``tile_batch`` to hand a pre-resolved
    :func:`pick_tiling` pair straight through (``fit_pallas`` does: its
    padding must agree bit-for-bit with the window used here, including
    when the chosen tile exceeds the 8-rounded batch — e.g. batch 20 ->
    one 32-row window). ``derive_mask=True``
    recomputes the mask from ``error > 0`` in-kernel instead of streaming
    it from HBM (survey-scale memory saver); ``loglam`` (see
    :func:`make_pallas_epoch_fn`) likewise replaces the zabs plane with a
    per-spectrum redshift column. Returns (new state,
    reference-bookkeeping epoch loss).
    """
    n = data.size
    b = config.batch_size
    if tile_batch is None:
        tb, br = pick_tiling(b, data.delta.shape[1])
        if batch_rows is not None:
            br = batch_rows
    elif batch_rows is not None:
        # pre-resolved (tile, window) pair — trust it, just round a
        # misaligned tile up to the sublane granule like the paths below
        tb = -(-tile_batch // 8) * 8
        br = batch_rows
    else:
        # Cap an explicit tile at the (8-rounded) batch: a tile larger
        # than the batch would silently inflate every update window to
        # the tile size, streaming mostly-inert rows. Misaligned tiles
        # are rounded up to the 8-row sublane granule Mosaic requires.
        tb = min(-(-tile_batch // 8) * 8, -(-b // 8) * 8)
        br = -(-b // tb) * tb
    if br % tb or br < b:
        raise ValueError(
            f"batch_rows {br} must be a multiple of the {tb}-row tile "
            f"covering the {b}-row batch (pick_tiling returns a "
            "consistent pair)"
        )
    if n % br:
        raise ValueError(
            f"dataset size {n} is not a whole number of {br}-row batch "
            f"windows (batch {b} padded up to the {tb}-row tile) — pad "
            f"with inert zero rows to a multiple of {br}, or call "
            "fit_pallas, which pads automatically"
        )
    epoch_fn = make_pallas_epoch_fn(
        config, tile_batch=tb, batch_rows=br, derive_mask=derive_mask,
        loglam=loglam, n_real=n_real, interpret=interpret,
    )
    state, loss = epoch_fn(state, data, key)
    return state, float(loss)


def fit_pallas(
    params: QFAParams,
    data: ResidualDataset,
    mu,
    config: TrainConfig,
    *,
    key: jax.Array | None = None,
    output_dir: str | None = None,
    logger: logging.Logger | None = None,
    metrics_cb: Callable[[int, float, float], None] | None = None,
    val_data: ResidualDataset | None = None,
    initial_state: TrainState | None = None,
    tile_batch: int | None = None,
    reshuffle_interval: int = 0,
    save_full_state: bool = True,
    derive_mask: bool = False,
    loglam=None,
    mesh=None,
    epochs_per_launch: int = 1,
    dp_exact: bool = False,
    batches_per_launch: int = 1,
    interpret: bool = False,
) -> tuple[QFAParams, list]:
    """Full training run on the single-launch epoch engine.

    Same contract as :func:`qfa_tpu.train.loop.fit` (resume via
    ``initial_state``, smoothing/saving/early-stop at epoch boundaries,
    held-out ``val_data`` evaluated after every epoch — always in the
    plane layout, independent of the training layout). The dataset is
    padded with inert zero rows up to a batch multiple, so the tail batch
    trains. ``reshuffle_interval > 0`` physically permutes the resident
    rows every K epochs (tile composition otherwise fixed; tile-to-batch
    assignment is random every epoch).

    ``mesh``: optional ``jax.sharding.Mesh`` — the run switches to the
    multi-chip whole-epoch engine (``parallel.epoch_dp``): the dataset is
    sharded over the spectrum axis, every device runs the fused epoch
    kernel on its shard (local SGD), and one pmean of parameters + Adam
    moments closes each epoch. All epoch-boundary amenities (NaN
    rollback, smoothing, checkpoints, early stop, resume) apply
    unchanged. ``reshuffle_interval`` is not supported with a mesh.

    ``dp_exact=True`` (with a ``mesh``) switches the multi-chip engine to
    ``parallel.sync_dp``: every optimizer step consumes the globally
    psum'd gradient (trajectory-exact data parallelism at kernel-launch
    cadence — measured ~1.2x the plain whole-epoch engine on one device
    at ``batches_per_launch=1``, vs ~8-12x for the per-batch
    ``parallel.dp`` cadence). ``batches_per_launch=K>1`` amortizes the
    per-window launch + collective further: interior batches update
    locally and the replicas re-sync every K batches (on ONE device any
    K remains trajectory-exact). Incompatible with
    ``epochs_per_launch > 1`` (sync windows are sub-epoch).

    ``epochs_per_launch > 1`` runs that many epochs inside ONE kernel
    launch (:func:`make_pallas_chunk_fn`); chunks auto-align to every
    smoothing/saving/reshuffle boundary, so those cadences — and the
    training trajectory, epoch for epoch — are identical to the
    unchunked run. Coarser-granular by construction: non-finite-loss
    rollback restores the pre-CHUNK state, the negative-loss early stop
    fires at the chunk end (the remaining chunk epochs have already
    run), and held-out validation is evaluated once per chunk. With a
    ``mesh`` the chunks run on the multi-chip engine with ONE collective
    per chunk — the replicas average every ``epochs_per_launch`` epochs
    instead of every epoch (local SGD with sync every N epochs; the
    trajectory therefore differs from the per-epoch-averaged run, unlike
    the single-device case where chunking is bitwise-neutral).
    """
    key = jax.random.key(0) if key is None else key
    state = (
        initial_state
        if initial_state is not None
        else TrainState(params, adam.init(params))
    )
    start_epoch = int(jax.device_get(state.opt_state.epoch))
    n_real = data.size  # before inert-row padding: the loss divisor

    # Pad the pixel axis to the kernel's lane width ONCE: the kernel's
    # own pad_px otherwise copies the full delta/error planes inside the
    # epoch jit EVERY epoch (measured ~40% of the 65k-spectrum epoch).
    from ..ops.fused_step import _round_up

    caller_leaves = tuple(data)
    p = _round_up(data.delta.shape[1], 128)

    def padpix(x):
        if x is None:
            return x
        # bf16 planes keep their dtype: the kernel streams them as-is and
        # casts tiles to f32 in VMEM (half the HBM bytes and residency)
        dt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
        if x.shape[1] == p and x.dtype == dt:
            return x
        return jnp.pad(x.astype(dt), ((0, 0), (0, p - x.shape[1])))

    # zabs pre-pad policy: in derive mode (loglam given) zabs is by
    # contract the zq column — leave it verbatim for the kernel's ABI
    # guard. In plane mode, pre-pad (a genuine plane whose width is a
    # 128-multiple, e.g. Nb % 128 == 0, must not fall through to the
    # kernel's in-jit pad_px, which re-copies the plane every epoch) —
    # UNLESS the width equals ZQ_LANES while no plane axis is that wide:
    # that buffer can only be a mistakenly-passed zq column, and padding
    # it would widen it into a fake plane the kernel cannot reject.
    from ..ops.epoch_kernel import ZQ_LANES

    nb_ = state.params.omega.shape[0]
    npix_ = state.params.F.shape[0]
    keep_zabs = loglam is not None or (
        data.zabs.shape[1] == ZQ_LANES and ZQ_LANES not in (nb_, npix_)
    )
    data = ResidualDataset(
        delta=padpix(data.delta),
        error=padpix(data.error),
        zabs=data.zabs if keep_zabs else padpix(data.zabs),
        # the kernel never reads the mask in derive mode — drop it rather
        # than keeping a full (N, P) float32 copy resident
        mask=None if derive_mask else padpix(data.mask),
    )
    # Tile + padded batch-window resolution (once, for every engine below):
    # batches whose size no sublane-aligned tile divides (e.g. the
    # reference default 500) span pick_tiling's padded batch_rows, and the
    # dataset is padded with inert zero rows (weight 0 / fully masked — no
    # gradient, count, or loss contribution) up to n_batches * batch_rows.
    ndev = 1 if mesh is None else mesh.devices.size
    if config.batch_size % ndev:
        raise ValueError(
            f"batch size {config.batch_size} not divisible by the "
            f"{ndev}-device mesh"
        )
    b_shard = config.batch_size // ndev  # per-device batch rows (real)
    if tile_batch is None:
        tb_used, b_shard_rows = pick_tiling(b_shard, data.delta.shape[1])
    else:
        # Cap an explicit tile at the (8-rounded) per-device batch —
        # otherwise tile_batch > b_shard silently inflates every batch
        # window to the tile size (mostly inert rows) instead of training
        # the configured batch size. Misaligned tiles round up to the
        # 8-row sublane granule Mosaic requires.
        tb_used = min(-(-tile_batch // 8) * 8, -(-b_shard // 8) * 8)
        b_shard_rows = -(-b_shard // tb_used) * tb_used
    batch_rows = b_shard_rows * ndev  # global rows each update spans
    n_batches = max(-(-n_real // config.batch_size), 1)
    pad = n_batches * batch_rows - data.size
    if pad:
        data = ResidualDataset(
            *(
                None
                if leaf is None
                else jnp.concatenate(
                    [leaf, jnp.zeros((pad,) + leaf.shape[1:], leaf.dtype)]
                )
                for leaf in data
            )
        )
    if mesh is not None:
        if reshuffle_interval:
            raise ValueError(
                "reshuffle_interval is not supported with a mesh (the "
                "shards reshuffle locally via the per-device tile "
                "permutation)"
            )
        from ..parallel.dp import shard_dataset

        data = shard_dataset(data, mesh)
    history: list = []

    from .loop import make_ckpt_saver, make_val_fn

    val_fn = make_val_fn(val_data, config.options)

    _save = make_ckpt_saver(output_dir, mu, save_full_state)

    # Reshuffles may donate only when EVERY surviving leaf is a buffer this
    # function created (pixel/row padding replaced it) — donating a leaf
    # still shared with the caller would consume the caller's array.
    owns_buffers = all(
        new is None or all(new is not old for old in caller_leaves)
        for new in data
    )
    if reshuffle_interval and start_epoch:
        # Exact resume: replay the physical permutations the uninterrupted
        # run applied at earlier epochs (their keys depend only on the base
        # key and the epoch number), so tile contents — and hence every
        # subsequent batch composition — match the uninterrupted trajectory.
        for past in range(reshuffle_interval, start_epoch,
                          reshuffle_interval):
            sub_past = jax.random.fold_in(key, past)
            data = reshuffle_dataset(
                data, jax.random.fold_in(sub_past, 1), donate=owns_buffers
            )
            owns_buffers = True
    if dp_exact and mesh is None:
        raise ValueError("dp_exact=True requires a mesh")
    if dp_exact and epochs_per_launch > 1:
        raise ValueError(
            "dp_exact is incompatible with epochs_per_launch > 1: exact-DP "
            "windows are sub-epoch (use batches_per_launch to amortize "
            "launches instead)"
        )
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        from ..parallel.epoch_dp import make_epoch_dp_fn

        # place the state replicated on the mesh UP FRONT: the epoch fn
        # returns mesh-replicated state, so an unsharded initial state
        # would force a second compile on the second epoch
        state = jax.device_put(state, NamedSharding(mesh, PartitionSpec()))
        if dp_exact:
            from ..parallel.sync_dp import make_sync_dp_epoch_fn

            dp_epoch_fn = make_sync_dp_epoch_fn(
                config, mesh, batches_per_launch=batches_per_launch,
                tile_batch=tb_used, batch_rows=batch_rows,
                loglam=loglam, n_real=n_real, interpret=interpret,
            )
            make_chunk_runner = None  # sync windows are sub-epoch
        else:
            dp_epoch_fn = make_epoch_dp_fn(
                config, mesh, tile_batch=tb_used, batch_rows=batch_rows,
                loglam=loglam, n_real=n_real, interpret=interpret,
            )
            dp_chunk_fns: dict = {}  # chunk size -> jitted multi-epoch fn

            def make_chunk_runner(chunk):
                fn = dp_chunk_fns.get(chunk)
                if fn is None:
                    fn = dp_chunk_fns[chunk] = make_epoch_dp_fn(
                        config, mesh, tile_batch=tb_used,
                        batch_rows=batch_rows, loglam=loglam,
                        n_real=n_real, epochs_per_launch=chunk,
                        interpret=interpret,
                    )
                return fn

        def run_epoch(state, sub):
            st, loss = dp_epoch_fn(state, data, sub)
            return st, float(loss)

    else:
        make_chunk_runner = None

        def run_epoch(state, sub):
            # batch_rows must be the SAME window this function padded the
            # dataset for — re-deriving it from the tile alone crashes
            # whenever pick_tiling chose a tile wider than the 8-rounded
            # batch (e.g. batch 20 -> one 32-row window)
            return pallas_train_epoch(
                state, data, sub, config, tile_batch=tb_used,
                batch_rows=batch_rows, derive_mask=derive_mask,
                loglam=loglam, n_real=n_real, interpret=interpret,
            )

    epl = max(1, int(epochs_per_launch))

    epoch = start_epoch
    while epoch < config.n_epochs:
        # Chunks END exactly at the next epoch-boundary action, so the
        # smoothing/saving/reshuffle cadence matches the unchunked run.
        chunk = min(
            epl,
            config.n_epochs - epoch,
            config.smooth_interval - epoch % config.smooth_interval,
        )
        if output_dir:
            chunk = min(
                chunk, config.save_interval - epoch % config.save_interval
            )
        if reshuffle_interval:
            chunk = min(
                chunk, reshuffle_interval - epoch % reshuffle_interval
            )
        sub = jax.random.fold_in(key, epoch)
        if reshuffle_interval and epoch and epoch % reshuffle_interval == 0:
            # never donate the CALLER's buffers (first reshuffle copies)
            data = reshuffle_dataset(
                data, jax.random.fold_in(sub, 1), donate=owns_buffers
            )
            owns_buffers = True
        t0 = time.perf_counter()
        prev_state = state  # rollback anchor (the epoch fns do not donate)
        if chunk == 1:
            state, loss = run_epoch(state, sub)
            losses = [loss]
        else:
            if make_chunk_runner is not None:
                chunk_fn = make_chunk_runner(chunk)
            else:
                chunk_fn = make_pallas_chunk_fn(
                    config, n_epochs=chunk, tile_batch=tb_used,
                    batch_rows=batch_rows, derive_mask=derive_mask,
                    loglam=loglam, n_real=n_real, interpret=interpret,
                )
            # the chunk fns fold the per-epoch subkeys themselves: pass
            # the BASE key so per-epoch shuffles match the unchunked run
            state, loss_vec = chunk_fn(state, data, key)
            losses = [float(x) for x in np.asarray(loss_vec)]
        dt = time.perf_counter() - t0
        history.extend(losses)
        rejected = config.reject_nonfinite and not all(
            np.isfinite(x) for x in losses
        )
        if rejected:
            # Epoch-granular guard_nonfinite (the in-kernel optimizer has
            # no per-step rejection): a poisoned epoch must not corrupt
            # parameters, Adam moments, or any later checkpoint. Roll back
            # params + moments to the pre-launch state; keep the advanced
            # epoch counter so the schedule/trajectory bookkeeping matches
            # the XLA engines' "rejected step still counts" semantics.
            # Epoch-boundary actions below (interval smoothing, checkpoint
            # save) still run on the restored — valid — state, like an
            # XLA-engine epoch whose poisoned steps were rejected.
            state = TrainState(
                prev_state.params,
                adam.AdamState(
                    m=prev_state.opt_state.m,
                    v=prev_state.opt_state.v,
                    epoch=state.opt_state.epoch,
                ),
            )
            if logger is not None:
                logger.warning(
                    "epoch%s %03d%s produced non-finite loss %s: update"
                    " rejected, parameters and moments rolled back",
                    "s" if chunk > 1 else "", epoch,
                    f"-{epoch + chunk - 1:03d}" if chunk > 1 else "",
                    losses,
                )
        val_loss = (
            None
            if val_fn is None or rejected
            else float(val_fn(state.params))
        )
        for k, loss in enumerate(losses):
            if logger is not None and not rejected:
                msg = (
                    f"epoch: {epoch + k:03d}/{config.n_epochs:03d}  ;  "
                    f"loss:  {loss:.2f}  ;  time:  {dt / chunk:.2f} s"
                )
                if val_loss is not None and k == chunk - 1:
                    msg += f"  ;  val_loss:  {val_loss:.2f}"
                logger.info(msg)
            if metrics_cb is not None:
                metrics_cb(epoch + k, loss, dt / chunk)
        ckpt = epoch + chunk
        if config.stop_on_negative_loss and any(x < 0.0 for x in losses):
            state.params = smooth_params(state.params)
            if output_dir:
                _save(state, ckpt)
            break
        if ckpt % config.smooth_interval == 0:
            state.params = smooth_params(state.params)
        if output_dir and ckpt % config.save_interval == 0:
            _save(state, ckpt)
        epoch = ckpt
    return state.params, history
