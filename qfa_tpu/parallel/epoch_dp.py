"""Multi-chip whole-epoch training: local SGD + per-epoch averaging.

The exact-DP engines (``parallel.dp``) psum gradients every batch, which
forces per-batch dispatch — the measured 7.8x single-chip overhead the
whole-epoch Pallas kernel (``ops.epoch_kernel``) exists to remove
(BENCH_r03 ``dp_overhead_vs_fit_pallas``). This engine keeps the
single-launch cadence on EVERY chip: each device runs the full fused
epoch kernel on its own data shard with local batches (one kernel launch
per device per epoch), then ONE collective per epoch averages parameters
and Adam moments across the mesh (``pmean``) and psums the loss
bookkeeping.

This is local SGD with per-epoch model averaging (a.k.a. FedAvg with one
round per epoch): the trajectory is not bit-identical to exact DP — each
optimizer step sees 1/ndev of the global batch — but the step COUNT and
the reference's epoch-loss bookkeeping are preserved, the collective
volume is ~1 MB of parameters per epoch (vs per batch), and multi-chip
throughput projects as N x the single-chip whole-epoch rate. The
reference has no distributed support at all (SURVEY.md section 2,
"parallelism components"); for bit-exact DP semantics use
``parallel.dp.make_dp_epoch_fn``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..data.loader import ResidualDataset
from ..ops.epoch_kernel import fused_train_epoch
from ..train import adam
from ..train.loop import TrainConfig, TrainState

Array = jnp.ndarray

__all__ = ["make_epoch_dp_fn", "epoch_dp_train_epoch"]


def make_epoch_dp_fn(
    config: TrainConfig,
    mesh: Mesh,
    *,
    tile_batch: int | None = None,
    batch_rows: int | None = None,
    loglam=None,
    n_real: int | None = None,
    epochs_per_launch: int = 1,
    interpret: bool = False,
):
    """Jitted multi-chip epoch ``(state, data, key) -> (state, loss)``.

    ``data`` must be sharded over the spectrum axis
    (:func:`parallel.dp.shard_dataset`) with every per-device shard a
    multiple of ``tile_batch`` and of the LOCAL batch window
    ``(batch_rows or config.batch_size) // ndev`` — ``batch_rows`` is the
    tile-padded per-update row count from
    ``train.pallas_engine.pick_tiling`` for batch sizes no sublane-aligned
    tile divides (the padding rows are inert; ``fit_pallas(mesh=...)``
    builds all of this automatically); the state stays replicated.
    ``tile_batch=None`` (the default) picks the npix-aware VMEM-safe tile
    that divides the local batch (``train.pallas_engine.pick_tile_batch``
    — 128 at DESI width, where a fixed 256 fails to compile); an explicit
    tile is clamped to the local batch and must stay sublane-aligned
    (a multiple of 8) off interpret mode — Mosaic rejects misaligned
    blocks with an obscure layout error otherwise. A ``None``
    mask leaf selects the in-kernel derived-mask layout (masked pixels
    must carry ``error == 0``), exactly as in ``fused_train_epoch``. Each
    device draws its own tile permutation (device-folded key), runs the
    whole-epoch kernel on its shard, and the epoch ends with ONE fused
    psum carrying the 1/ndev-scaled parameters + moments (== pmean) and
    the per-batch loss books — the only collective of the epoch.

    Loss bookkeeping matches the reference
    (``/root/reference/QFA/model.py:206-213``): per-GLOBAL-batch sums are
    psum'd across devices before the batch-mean division, so the reported
    epoch loss is the true global batch-mean sum over
    ``floor(n_real / batch_size)``.

    ``epochs_per_launch > 1`` fuses that many epochs into ONE kernel
    launch per device AND one collective per launch: the replicas
    average only at chunk ends (local SGD with sync every N epochs —
    N x less ICI traffic and launch overhead, more local drift between
    syncs than per-epoch averaging). The returned fn then takes the
    run's BASE key — epoch ``e`` of the chunk derives its per-device
    permutation from ``fold_in(fold_in(base, epoch0 + e), device)``,
    matching the per-epoch subkeys the ``epochs_per_launch == 1`` cadence
    uses — and returns ``(state, losses[n_epochs])``.
    """
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    if config.batch_size % ndev:
        raise ValueError(
            f"batch size {config.batch_size} not divisible by the "
            f"{ndev}-device mesh"
        )
    b_local = config.batch_size // ndev
    if batch_rows is not None and batch_rows % ndev:
        raise ValueError(
            f"batch_rows {batch_rows} not divisible by the {ndev}-device "
            "mesh"
        )
    # rows each local update spans: b_local plus inert padding when the
    # caller (fit_pallas) padded batches up to a tile multiple
    b_local_rows = b_local if batch_rows is None else batch_rows // ndev
    epl = int(epochs_per_launch)
    if epl < 1:
        raise ValueError(f"epochs_per_launch must be >= 1, got {epl}")

    def resolve_tile(npix: int) -> int:
        if tile_batch is None:
            # divisor tile, NOT pick_tiling: this layer has no padding
            # machinery, so a padded window wider than the local rows
            # (which pick_tiling may prefer) cannot be honored here
            from ..train.pallas_engine import pick_divisor_tile

            tb = pick_divisor_tile(b_local_rows, npix)
        else:
            tb = min(tile_batch, b_local_rows)
        if b_local_rows % tb:
            raise ValueError(
                f"tile_batch {tb} does not divide the local batch "
                f"window of {b_local_rows} rows (global batch "
                f"{config.batch_size} over {ndev} devices"
                + (f", padded to {batch_rows} rows"
                   if batch_rows is not None else "")
                + ") — pass batch_rows from pick_tiling, or let "
                "fit_pallas(mesh=...) pad the dataset automatically"
            )
        if not interpret and tb % 8:
            raise ValueError(
                f"resolved tile of {tb} rows is not sublane-aligned; the "
                f"Pallas epoch kernel needs 8-row multiples on hardware — "
                f"pick a global batch whose per-device share "
                f"({b_local_rows} here) is divisible by an 8-multiple "
                "tile, or let fit_pallas(mesh=...) pad batches to an "
                "aligned tile automatically"
            )
        return tb

    def local_epoch(state: TrainState, data: ResidualDataset, key):
        n_local = data.delta.shape[0]
        tb = resolve_tile(data.delta.shape[1])
        # b_local_rows % tb is already guaranteed by resolve_tile, so
        # n_local % b_local_rows == 0 implies n_local % tb == 0 too — but
        # check both explicitly so an invalid shard fails with the right
        # message (never a ZeroDivisionError, and never a silent
        # wrong-size batch).
        if n_local % b_local_rows or n_local % tb:
            raise ValueError(
                f"local shard of {n_local} rows is not a whole number of "
                f"{b_local_rows}-row batch windows ({tb}-row tiles; "
                f"global batch {config.batch_size} over {ndev} devices) — "
                f"pad the dataset to a multiple of {b_local_rows * ndev} "
                "rows"
            )
        dev = jax.lax.axis_index(axis)
        if epl == 1:
            perm = jax.random.permutation(
                jax.random.fold_in(key, dev), n_local // tb
            )
        else:
            # chunked: `key` is the run's BASE key; per-epoch subkeys are
            # re-derived exactly as the epl == 1 caller derives them
            ep0 = state.opt_state.epoch
            subs = jax.vmap(lambda k: jax.random.fold_in(key, k))(
                ep0 + jnp.arange(epl)
            )
            perm = jax.vmap(
                lambda s: jax.random.permutation(
                    jax.random.fold_in(s, dev), n_local // tb
                )
            )(subs)
        out = fused_train_epoch(
            state.params,
            state.opt_state.m,
            state.opt_state.v,
            data.delta,
            data.error,
            data.zabs,
            perm,
            data.mask,
            epoch=state.opt_state.epoch,
            n_batches=n_local // b_local_rows,
            n_epochs=epl,
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
        # THE collective of the epoch — exactly one. A per-leaf tree-pmean
        # would issue ~20 collectives, and on real hardware every kernel
        # launch carries fixed cost (the very overhead this engine
        # exists to avoid). Everything rides one psum: the state leaves
        # pre-scaled by 1/ndev (psum of x/n == pmean), the loss books raw.
        flat, treedef = jax.tree.flatten((out.params, out.m, out.v))
        sizes = [int(np.prod(x.shape)) if x.shape else 1 for x in flat]
        shapes = [x.shape for x in flat]
        books = out.loss_sums.size  # epl * n_batches entries per book
        vec = jnp.concatenate(
            [x.reshape(-1).astype(jnp.float32) / ndev for x in flat]
            + [out.loss_sums.reshape(-1), out.n_real.reshape(-1)]
        )
        vec = jax.lax.psum(vec, axis)
        parts, off = [], 0
        for sz, shp in zip(sizes, shapes):
            parts.append(vec[off : off + sz].reshape(shp))
            off += sz
        params, m_avg, v_avg = jax.tree.unflatten(treedef, parts)
        loss_sums = vec[off : off + books]
        n_real_b = vec[off + books : off + 2 * books]
        new_state = TrainState(
            params,
            adam.AdamState(
                m=m_avg, v=v_avg, epoch=state.opt_state.epoch + epl
            ),
        )
        n_total = n_local * ndev if n_real is None else n_real
        batch_means = loss_sums / jnp.maximum(n_real_b, 1.0)
        denom = max(n_total // config.batch_size, 1)
        if epl == 1:
            loss = jnp.sum(batch_means) / denom
        else:
            loss = jnp.sum(batch_means.reshape(epl, -1), axis=1) / denom
        return new_state, loss

    rep = P()
    sharded = jax.shard_map(
        local_epoch,
        mesh=mesh,
        in_specs=(rep, P(axis, None), rep),
        out_specs=(rep, rep),
        check_vma=False,
    )
    # Place inputs before the jit sees them (rationale in
    # mesh.jit_with_placed_inputs: an unplaced first trace degrades
    # chained epochs ~100x on the tunneled TPU). The key stays unplaced.
    from .mesh import jit_with_placed_inputs

    return jit_with_placed_inputs(
        sharded, mesh, (P(), P(axis, None), None)
    )


def epoch_dp_train_epoch(
    state: TrainState,
    data: ResidualDataset,
    key: jax.Array,
    config: TrainConfig,
    mesh: Mesh,
    epoch_fn=None,
    **kwargs,
) -> tuple[TrainState, float]:
    """Run one multi-chip whole-epoch-kernel launch; returns (state, loss).

    With ``epochs_per_launch > 1`` the launch covers several epochs and
    the kernel reports one mean loss per epoch — this helper then returns
    the LAST epoch's loss (the state after the launch corresponds to it);
    use the raw ``make_epoch_dp_fn`` output for the full per-epoch vector.
    """
    if epoch_fn is None:
        epoch_fn = make_epoch_dp_fn(config, mesh, **kwargs)
    state, loss = epoch_fn(state, data, key)
    loss = np.asarray(loss)
    return state, float(loss if loss.ndim == 0 else loss[-1])
