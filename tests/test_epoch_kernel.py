"""Whole-epoch fused Pallas trainer vs the XLA scan epoch (interpret mode).

The mega-kernel must reproduce the XLA path's entire epoch — loss
bookkeeping, reference-normalized gradients, per-epoch Adam semantics,
clipping — on identical batch compositions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import qfa_tpu
from qfa_tpu.data.loader import ResidualDataset
from qfa_tpu.data.synthetic import generate
from qfa_tpu.models import random_init
from qfa_tpu.ops.epoch_kernel import fused_train_epoch
from qfa_tpu.train import TrainConfig, TrainState, adam
from qfa_tpu.train.loop import make_epoch_fn


@pytest.fixture(scope="module")
def problem():
    grid = qfa_tpu.make_grid(1030.0, 1090.0, 1e-3)
    nh = 4
    true = random_init(jax.random.key(0), grid.npix, grid.nb, nh)
    mu = jnp.full((grid.npix,), 1.1, jnp.float32)
    n = 64
    syn = generate(jax.random.key(1), true, mu, grid, n, mask_frac=0.15)
    b = syn.to_batch(mu)
    data = ResidualDataset(delta=b.delta, error=b.error, zabs=b.zabs,
                           mask=b.mask)
    return grid, nh, data


def run_both(grid, nh, data, *, epoch=0, wd=0.01, refnorm=True,
             state=None, tile_perm=None):
    n = data.size
    tb, n_batches = 8, 2
    tpb = (n // tb) // n_batches
    if tile_perm is None:
        tile_perm = jax.random.permutation(jax.random.key(3), n // tb)
    cfg = TrainConfig(batch_size=n // n_batches, learning_rate=1e-2,
                      weight_decay=wd, reference_norm=refnorm,
                      reject_nonfinite=False)

    if state is None:
        p0 = random_init(jax.random.key(2), grid.npix, grid.nb, nh)
        state = TrainState(p0, adam.init(p0))
        state.opt_state = state.opt_state._replace(
            epoch=jnp.asarray(epoch, jnp.int32)
        )

    # mega-kernel (interpret mode)
    out = fused_train_epoch(
        state.params, state.opt_state.m, state.opt_state.v,
        data.delta, data.error, data.zabs,
        tile_perm,
        epoch=jnp.asarray(epoch, jnp.int32),
        n_batches=n_batches,
        tile_batch=tb,
        learning_rate=cfg.learning_rate,
        weight_decay=cfg.weight_decay,
        decay_alpha=cfg.decay_alpha,
        decay_step=cfg.decay_step,
        reference_norm=refnorm,
        interpret=True,
    )

    # XLA scan epoch on the SAME batch composition
    rows = jnp.arange(n).reshape(n // tb, tb)[tile_perm].reshape(
        n_batches, cfg.batch_size
    )
    st2 = TrainState(state.params, state.opt_state)
    st2, loss = make_epoch_fn(cfg)(st2, data, rows)
    return out, st2, loss


def test_epoch_kernel_matches_xla_epoch(problem):
    grid, nh, data = problem
    out, st_xla, loss_xla = run_both(grid, nh, data)

    # per-batch losses: XLA returns sum(batch means)/niter
    mega_loss = float(jnp.sum(out.loss_sums / jnp.maximum(out.n_real, 1.0)) / 2)
    assert mega_loss == pytest.approx(float(loss_xla), rel=1e-5)

    for name in ("F", "Psi", "omega", "tau0", "c0", "beta"):
        a = np.asarray(getattr(out.params, name))
        b = np.asarray(getattr(st_xla.params, name))
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-6, err_msg=name)
        ma = np.asarray(getattr(out.m, name))
        mb = np.asarray(getattr(st_xla.opt_state.m, name))
        np.testing.assert_allclose(ma, mb, rtol=2e-3, atol=2e-6,
                                   err_msg=f"m.{name}")
        va = np.asarray(getattr(out.v, name))
        vb = np.asarray(getattr(st_xla.opt_state.v, name))
        np.testing.assert_allclose(va, vb, rtol=2e-3, atol=1e-9,
                                   err_msg=f"v.{name}")


def test_epoch_kernel_respects_epoch_counter_and_schedule(problem):
    """LR schedule + bias correction follow the per-epoch counter."""
    grid, nh, data = problem
    out_e0, st_e0, _ = run_both(grid, nh, data, epoch=0)
    out_e25, st_e25, _ = run_both(grid, nh, data, epoch=25)
    # different epoch -> different schedule -> different result, both match XLA
    assert not np.allclose(np.asarray(out_e0.params.F),
                           np.asarray(out_e25.params.F))
    np.testing.assert_allclose(
        np.asarray(out_e25.params.F), np.asarray(st_e25.params.F),
        rtol=2e-4, atol=2e-6,
    )


def test_epoch_kernel_mean_norm_mode(problem):
    """reference_norm=False (plain batch-mean gradients) also matches."""
    grid, nh, data = problem
    out, st_xla, _ = run_both(grid, nh, data, refnorm=False)
    np.testing.assert_allclose(
        np.asarray(out.params.F), np.asarray(st_xla.params.F),
        rtol=2e-4, atol=2e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out.params.Psi), np.asarray(st_xla.params.Psi),
        rtol=2e-4, atol=2e-6,
    )


def test_epoch_kernel_padded_rows_are_inert(problem):
    """Fully-masked padding rows change nothing (including n_real)."""
    grid, nh, data = problem
    out_a, _, _ = run_both(grid, nh, data)

    pad = 16
    padded = ResidualDataset(
        *(jnp.concatenate([leaf, jnp.zeros((pad,) + leaf.shape[1:],
                                           leaf.dtype)]) for leaf in data)
    )
    # put the pad tiles at the end of the last batch
    n_tiles = data.size // 8
    pad_tiles = pad // 8
    perm_a = jax.random.permutation(jax.random.key(3), n_tiles)
    perm_b = jnp.concatenate([
        perm_a, jnp.arange(n_tiles, n_tiles + pad_tiles, dtype=perm_a.dtype)
    ])
    p0 = random_init(jax.random.key(2), grid.npix, grid.nb, nh)
    state = TrainState(p0, adam.init(p0))
    kw = dict(
        epoch=jnp.asarray(0, jnp.int32), tile_batch=8,
        learning_rate=1e-2, weight_decay=0.01, interpret=True,
    )
    out_pad = fused_train_epoch(
        state.params, state.opt_state.m, state.opt_state.v,
        padded.delta, padded.error, padded.zabs,
        perm_b, n_batches=2, **kw,
    )
    # padding rows contribute nothing to the real-row counts
    assert float(jnp.sum(out_pad.n_real)) == data.size
    del out_a  # different batch grouping -> per-batch losses not comparable
    # the padded run equals the XLA epoch on the SAME (padded) batches
    cfg = TrainConfig(batch_size=padded.size // 2, learning_rate=1e-2,
                      weight_decay=0.01, reject_nonfinite=False)
    rows = jnp.arange(padded.size).reshape(-1, 8)[perm_b].reshape(
        2, cfg.batch_size
    )
    wt = (rows < data.size).astype(jnp.float32)
    st2 = TrainState(state.params, state.opt_state)
    st2, _ = make_epoch_fn(cfg)(st2, padded, rows, wt)
    np.testing.assert_allclose(np.asarray(out_pad.params.F),
                               np.asarray(st2.params.F), rtol=2e-4,
                               atol=2e-6)


def test_fit_pallas_full_run(problem, tmp_path):
    """fit_pallas: epoch-boundary semantics (smooth/save/resume) on the
    single-launch engine (interpret mode)."""
    import os

    from qfa_tpu.train import fit_pallas
    from qfa_tpu.train.checkpoint import latest_checkpoint, load_state

    grid, nh, data = problem
    mu = jnp.full((grid.npix,), 1.1, jnp.float32)
    cfg = TrainConfig(n_epochs=3, batch_size=24, learning_rate=1e-2,
                      weight_decay=0.0, smooth_interval=2, save_interval=2)
    p0 = random_init(jax.random.key(5), grid.npix, grid.nb, nh)
    out = str(tmp_path / "pallas_fit")
    # 64 rows, batch 24 -> padded to 72 with inert rows (tail trains)
    params, history = fit_pallas(
        p0, data, mu, cfg, key=jax.random.key(6), output_dir=out,
        tile_batch=8, interpret=True,
    )
    assert len(history) == 3 and np.isfinite(history).all()
    assert os.path.exists(f"{out}/checkpoints/state_epoch_02.npz")

    # resume from the snapshot -> same trajectory as uninterrupted
    st, _ = load_state(latest_checkpoint(f"{out}/checkpoints"))
    assert int(st.opt_state.epoch) == 2
    params_b, hist_b = fit_pallas(
        None, data, mu, cfg, key=jax.random.key(6), initial_state=st,
        tile_batch=8, interpret=True,
    )
    assert len(hist_b) == 1
    # epoch 2 ran pre-smoothing in both runs -> same loss
    assert hist_b[0] == pytest.approx(history[2], rel=1e-5)


def test_epoch_kernel_derived_mask_matches(problem):
    """mask=None (derived from error > 0) equals the explicit-mask run."""
    grid, nh, data = problem
    p0 = random_init(jax.random.key(2), grid.npix, grid.nb, nh)
    st = TrainState(p0, adam.init(p0))
    perm = jax.random.permutation(jax.random.key(3), data.size // 8)
    kw = dict(epoch=jnp.asarray(0, jnp.int32), n_batches=2, tile_batch=8,
              learning_rate=1e-2, weight_decay=0.01, interpret=True)
    out_m = fused_train_epoch(
        st.params, st.opt_state.m, st.opt_state.v,
        data.delta, data.error, data.zabs, perm, data.mask, **kw,
    )
    out_d = fused_train_epoch(
        st.params, st.opt_state.m, st.opt_state.v,
        data.delta, data.error, data.zabs, perm, None, **kw,
    )
    np.testing.assert_allclose(np.asarray(out_d.loss_sums),
                               np.asarray(out_m.loss_sums), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(out_d.params), jax.tree.leaves(out_m.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-8)


def test_fit_pallas_validation(problem, caplog):
    """Held-out validation NLL is evaluated and logged each epoch."""
    import logging

    from qfa_tpu.train import fit_pallas

    grid, nh, data = problem
    mu = jnp.full((grid.npix,), 1.1, jnp.float32)
    cfg = TrainConfig(n_epochs=2, batch_size=32, learning_rate=1e-2,
                      weight_decay=0.0, smooth_interval=100,
                      save_interval=100)
    p0 = random_init(jax.random.key(5), grid.npix, grid.nb, nh)
    val = ResidualDataset(*(leaf[:16] for leaf in data))
    logger = logging.getLogger("test_fit_pallas_validation")
    with caplog.at_level(logging.INFO, logger=logger.name):
        fit_pallas(p0, data, mu, cfg, key=jax.random.key(6), tile_batch=8,
                   val_data=val, logger=logger, interpret=True)
    val_lines = [r.message for r in caplog.records if "val_loss" in r.message]
    assert len(val_lines) == 2
    import re

    vals = [float(re.search(r"val_loss:\s+(-?[\d.]+)", m).group(1))
            for m in val_lines]
    assert all(np.isfinite(v) for v in vals)


def test_epoch_kernel_derive_zabs_matches():
    """derive_zabs (in-kernel log(1+zabs) from the zq column) equals the
    explicit zabs-plane run to float32 rounding."""
    from qfa_tpu.ops import loglam_row, zq_column

    grid = qfa_tpu.make_grid(1030.0, 1090.0, 1e-3)
    nh = 4
    true = random_init(jax.random.key(0), grid.npix, grid.nb, nh)
    mu = jnp.full((grid.npix,), 1.1, jnp.float32)
    syn = generate(jax.random.key(1), true, mu, grid, 64, mask_frac=0.15)
    b = syn.to_batch(mu)
    perm = jax.random.permutation(jax.random.key(3), 8)
    p0 = random_init(jax.random.key(2), grid.npix, grid.nb, nh)
    st = TrainState(p0, adam.init(p0))
    kw = dict(epoch=jnp.asarray(0, jnp.int32), n_batches=2, tile_batch=8,
              learning_rate=1e-2, weight_decay=0.01, interpret=True)
    out_plane = fused_train_epoch(
        st.params, st.opt_state.m, st.opt_state.v,
        b.delta, b.error, b.zabs, perm, b.mask, **kw,
    )
    out_col = fused_train_epoch(
        st.params, st.opt_state.m, st.opt_state.v,
        b.delta, b.error, zq_column(syn.zqso), perm, b.mask,
        loglam=loglam_row(grid.wav), derive_zabs=True, **kw,
    )
    np.testing.assert_allclose(np.asarray(out_col.loss_sums),
                               np.asarray(out_plane.loss_sums), rtol=1e-5)
    for name in ("F", "Psi", "omega", "tau0", "c0", "beta"):
        np.testing.assert_allclose(
            np.asarray(getattr(out_col.params, name)),
            np.asarray(getattr(out_plane.params, name)),
            rtol=5e-4, atol=1e-5, err_msg=name,
        )


def test_fit_pallas_derive_zabs_and_mask(problem, tmp_path):
    """fit_pallas runs end-to-end in the survey-scale memory mode (zq
    column + in-kernel mask), matching the plane-mode trajectory."""
    from qfa_tpu.ops import loglam_row, zq_column
    from qfa_tpu.train import fit_pallas

    grid = qfa_tpu.make_grid(1030.0, 1090.0, 1e-3)
    nh = 4
    true = random_init(jax.random.key(0), grid.npix, grid.nb, nh)
    mu = jnp.full((grid.npix,), 1.1, jnp.float32)
    syn = generate(jax.random.key(1), true, mu, grid, 64, mask_frac=0.15)
    b = syn.to_batch(mu)
    # batch 24 does not divide 64 rows: both runs exercise the inert-row
    # padding (including padding the None mask / zq-column leaves)
    cfg = TrainConfig(n_epochs=2, batch_size=24, learning_rate=1e-2,
                      weight_decay=0.0, smooth_interval=100,
                      save_interval=100)
    p0 = random_init(jax.random.key(5), grid.npix, grid.nb, nh)
    data_plane = ResidualDataset(delta=b.delta, error=b.error, zabs=b.zabs,
                                 mask=b.mask)
    params_a, hist_a = fit_pallas(
        p0, data_plane, mu, cfg, key=jax.random.key(6), tile_batch=8,
        interpret=True,
    )
    data_col = ResidualDataset(delta=b.delta, error=b.error,
                               zabs=zq_column(syn.zqso), mask=b.mask)
    params_b, hist_b = fit_pallas(
        p0, data_col, mu, cfg, key=jax.random.key(6), tile_batch=8,
        derive_mask=True, loglam=loglam_row(grid.wav), interpret=True,
    )
    np.testing.assert_allclose(hist_b, hist_a, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(params_b.F),
                               np.asarray(params_a.F), rtol=5e-4, atol=1e-5)


def test_epoch_kernel_nh8(problem):
    """Production latent width (nh=8) matches the XLA epoch too (the other
    tests use nh=4; the unrolled factorization is width-dependent)."""
    grid = qfa_tpu.make_grid(1030.0, 1090.0, 1e-3)
    nh = 8
    true = random_init(jax.random.key(0), grid.npix, grid.nb, nh)
    mu = jnp.full((grid.npix,), 1.1, jnp.float32)
    syn = generate(jax.random.key(1), true, mu, grid, 32, mask_frac=0.15)
    b = syn.to_batch(mu)
    data = ResidualDataset(delta=b.delta, error=b.error, zabs=b.zabs,
                           mask=b.mask)
    cfg = TrainConfig(batch_size=16, learning_rate=1e-2, weight_decay=0.01,
                      reject_nonfinite=False)
    p0 = random_init(jax.random.key(2), grid.npix, grid.nb, nh)
    st = TrainState(p0, adam.init(p0))
    perm = jax.random.permutation(jax.random.key(3), 4)
    out = fused_train_epoch(
        st.params, st.opt_state.m, st.opt_state.v,
        data.delta, data.error, data.zabs, perm, data.mask,
        epoch=jnp.asarray(0, jnp.int32), n_batches=2, tile_batch=8,
        learning_rate=1e-2, weight_decay=0.01, interpret=True,
    )
    rows = jnp.arange(32).reshape(4, 8)[perm].reshape(2, 16)
    st2, _ = make_epoch_fn(cfg)(TrainState(p0, adam.init(p0)), data, rows)
    np.testing.assert_allclose(np.asarray(out.params.F),
                               np.asarray(st2.params.F), rtol=3e-4,
                               atol=3e-6)
    np.testing.assert_allclose(float(out.params.tau0),
                               float(st2.params.tau0), rtol=1e-4)


def test_fit_pallas_zq_column_without_loglam_raises():
    """A zq column passed without derive_zabs/loglam must fail loudly —
    fit_pallas's pixel pre-pad must not widen it into a fake zabs plane
    (regression: the pad once defeated the kernel's ABI guard). Uses the
    SDSS grid: on tiny grids p == 128 and a column is indistinguishable
    from a padded plane."""
    from qfa_tpu.ops import zq_column
    from qfa_tpu.train import fit_pallas

    grid = qfa_tpu.make_grid()
    assert grid.npix == 1913
    p0 = random_init(jax.random.key(0), grid.npix, grid.nb, 4)
    mu = jnp.ones((grid.npix,), jnp.float32)
    data = ResidualDataset(
        delta=jnp.zeros((8, grid.npix), jnp.float32),
        error=jnp.ones((8, grid.npix), jnp.float32),
        zabs=zq_column(jnp.full((8,), 2.5)),
        mask=None,
    )
    cfg = TrainConfig(n_epochs=1, batch_size=8, smooth_interval=100,
                      save_interval=100)
    with pytest.raises(ValueError, match="derive_zabs"):
        fit_pallas(p0, data, mu, cfg, derive_mask=True, tile_batch=8,
                   interpret=True)


def test_pallas_epoch_loss_divisor_uses_real_count(problem):
    """With a padded (non-batch-multiple) dataset the epoch loss divides
    by floor(N_real/B), matching the XLA engine and the reference
    (/root/reference/QFA/model.py:206-213) — not the padded batch count."""
    from qfa_tpu.train import fit_pallas  # noqa: F401  (engine import path)
    from qfa_tpu.train.pallas_engine import make_pallas_epoch_fn

    grid, nh, data = problem  # 64 rows
    pad = 8  # pad to 72 = 3 batches of 24; floor(64/24) = 2
    padded = ResidualDataset(
        *(jnp.concatenate([leaf, jnp.zeros((pad,) + leaf.shape[1:],
                                           leaf.dtype)]) for leaf in data)
    )
    p0 = random_init(jax.random.key(2), grid.npix, grid.nb, nh)
    cfg = TrainConfig(batch_size=24, learning_rate=1e-2, weight_decay=0.0)
    kw = dict(tile_batch=8, interpret=True)
    st = TrainState(p0, adam.init(p0))
    _, loss_padded_count = make_pallas_epoch_fn(cfg, **kw)(
        st, padded, jax.random.key(7)
    )
    st = TrainState(p0, adam.init(p0))
    _, loss_real_count = make_pallas_epoch_fn(cfg, n_real=64, **kw)(
        st, padded, jax.random.key(7)
    )
    # same sum of batch means, divisors 3 vs 2
    assert float(loss_real_count) == pytest.approx(
        1.5 * float(loss_padded_count), rel=1e-6
    )


def test_fit_pallas_resume_replays_reshuffles(problem, tmp_path):
    """Resume mid-run with reshuffle_interval>0 reproduces the
    uninterrupted trajectory (past permutations are replayed)."""
    from qfa_tpu.train import fit_pallas
    from qfa_tpu.train.checkpoint import load_state

    grid, nh, data = problem
    mu = jnp.full((grid.npix,), 1.1, jnp.float32)
    cfg = TrainConfig(n_epochs=5, batch_size=32, learning_rate=1e-2,
                      weight_decay=0.0, smooth_interval=100, save_interval=3)
    p0 = random_init(jax.random.key(5), grid.npix, grid.nb, nh)
    out = str(tmp_path / "rs")
    kw = dict(key=jax.random.key(6), tile_batch=8, reshuffle_interval=2,
              interpret=True)
    # uninterrupted: reshuffles at epochs 2 and 4, checkpoint at epoch 3
    params_a, hist_a = fit_pallas(p0, data, mu, cfg, output_dir=out, **kw)
    st, _ = load_state(f"{out}/checkpoints/state_epoch_03.npz")
    assert int(st.opt_state.epoch) == 3
    # resumed from epoch 3: must replay the epoch-2 permutation first
    params_b, hist_b = fit_pallas(None, data, mu, cfg, initial_state=st,
                                  **kw)
    np.testing.assert_allclose(hist_b, hist_a[3:], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(params_b.F),
                               np.asarray(params_a.F), rtol=1e-6, atol=1e-8)


def test_fit_pallas_reshuffle_keeps_caller_buffers(problem, tmp_path):
    """reshuffle_interval must not donate the CALLER's dataset buffers
    (regression: the first reshuffle used to consume them)."""
    grid, nh, data = problem
    mu = jnp.full((grid.npix,), 1.1, jnp.float32)
    cfg = TrainConfig(n_epochs=3, batch_size=32, learning_rate=1e-2,
                      weight_decay=0.0, smooth_interval=100,
                      save_interval=100)
    p0 = random_init(jax.random.key(5), grid.npix, grid.nb, nh)
    fit_kwargs = dict(key=jax.random.key(6), tile_batch=8,
                      reshuffle_interval=1, interpret=True)
    from qfa_tpu.train import fit_pallas

    params, history = fit_pallas(p0, data, mu, cfg, **fit_kwargs)
    # the caller's arrays are still alive and usable
    assert np.isfinite(np.asarray(data.delta)).all()
    assert np.isfinite(np.asarray(data.zabs)).all()
    assert np.isfinite(history).all()


def test_n_real_weight_lane_counts_fully_masked_rows():
    """Engine n_real reconciliation (VERDICT r2 #7): in the production
    derive_zabs layout the zq weight lane makes n_real count weight-1 rows
    exactly like the XLA engine — including a real-but-fully-masked
    spectrum — while the legacy plane layout's documented divergence
    (such a row is indistinguishable from padding) is pinned here."""
    from qfa_tpu.ops import loglam_row, zq_column

    grid = qfa_tpu.make_grid(1030.0, 1090.0, 1e-3)
    nh = 4
    true = random_init(jax.random.key(0), grid.npix, grid.nb, nh)
    mu = jnp.full((grid.npix,), 1.1, jnp.float32)
    syn = generate(jax.random.key(1), true, mu, grid, 64, mask_frac=0.15)
    b = syn.to_batch(mu)
    # fully mask row 5: a real spectrum with zero observed pixels
    kill = jnp.ones((64, 1), jnp.float32).at[5].set(0.0)
    delta, error, mask = b.delta * kill, b.error * kill, b.mask * kill
    perm = jnp.arange(8)
    p0 = random_init(jax.random.key(2), grid.npix, grid.nb, nh)
    st = TrainState(p0, adam.init(p0))
    kw = dict(epoch=jnp.asarray(0, jnp.int32), n_batches=2, tile_batch=8,
              learning_rate=1e-2, weight_decay=0.01, interpret=True)
    out_plane = fused_train_epoch(
        st.params, st.opt_state.m, st.opt_state.v,
        delta, error, b.zabs, perm, mask, **kw,
    )
    # plane mode: the fully-masked row is indistinguishable from padding
    assert float(jnp.sum(out_plane.n_real)) == 63
    out_col = fused_train_epoch(
        st.params, st.opt_state.m, st.opt_state.v,
        delta, error, zq_column(syn.zqso), perm, mask,
        loglam=loglam_row(grid.wav), derive_zabs=True, **kw,
    )
    # derive mode: the weight lane counts it, like the XLA engine
    assert float(jnp.sum(out_col.n_real)) == 64

    cfg = TrainConfig(batch_size=32, learning_rate=1e-2, weight_decay=0.01,
                      reject_nonfinite=False)
    rows = jnp.arange(64).reshape(8, 8)[perm].reshape(2, 32)
    data2 = ResidualDataset(delta=delta, error=error, zabs=b.zabs, mask=mask)
    st2 = TrainState(st.params, st.opt_state)
    _, loss_xla = make_epoch_fn(cfg)(st2, data2, rows)
    col_loss = float(
        jnp.sum(out_col.loss_sums / jnp.maximum(out_col.n_real, 1.0)) / 2
    )
    assert col_loss == pytest.approx(float(loss_xla), rel=1e-5)
    # pinned divergence: plane mode divides that batch by 31, not 32
    plane_loss = float(
        jnp.sum(out_plane.loss_sums / jnp.maximum(out_plane.n_real, 1.0)) / 2
    )
    assert plane_loss != pytest.approx(float(loss_xla), rel=1e-6)
    # the weight lane only changes bookkeeping, never the updates
    for a, c in zip(jax.tree.leaves(out_plane.params),
                    jax.tree.leaves(out_col.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=5e-4,
                                   atol=1e-5)


def test_derive_zabs_rejects_zabs_plane():
    """A genuine zabs PLANE passed with derive_zabs=True must fail loudly
    in the tightened ABI guard (ADVICE r2), even when its width is a
    128-multiple — not be silently misread as a zq column."""
    from qfa_tpu.ops import loglam_row
    from qfa_tpu.ops.epoch_kernel import _validate_zq

    plane = jnp.zeros((8, 256), jnp.float32)  # 128-multiple, not a column
    with pytest.raises(ValueError, match="zq_column"):
        _validate_zq(plane, loglam_row(jnp.linspace(1040.0, 1100.0, 256)), 8)


def test_fit_pallas_rejects_nonfinite_epoch(problem, caplog, tmp_path):
    """A poisoned epoch (inf in the data) must leave the state untouched
    and the run alive on the production engine — epoch-granular
    guard_nonfinite semantics (train/loop.py:60-73)."""
    import logging

    from qfa_tpu.train import fit_pallas

    grid, nh, data = problem
    mu = jnp.full((grid.npix,), 1.1, jnp.float32)
    poisoned = ResidualDataset(
        delta=data.delta.at[3, 10].set(jnp.inf),
        error=data.error, zabs=data.zabs, mask=data.mask,
    )
    import os

    cfg = TrainConfig(n_epochs=2, batch_size=32, learning_rate=1e-2,
                      weight_decay=0.0, smooth_interval=100,
                      save_interval=2)
    p0 = random_init(jax.random.key(5), grid.npix, grid.nb, nh)
    logger = logging.getLogger("test_nonfinite_epoch")
    out = str(tmp_path / "nan_guard")
    with caplog.at_level(logging.WARNING, logger=logger.name):
        params, history = fit_pallas(
            p0, poisoned, mu, cfg, key=jax.random.key(6), tile_batch=8,
            logger=logger, output_dir=out, interpret=True,
        )
    assert len(history) == 2 and not np.isfinite(history).any()
    # every epoch was rejected: parameters identical to the init
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p0)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    rejects = [r for r in caplog.records if "rolled back" in r.message]
    assert len(rejects) == 2
    # boundary actions still run on the restored state: the interval
    # checkpoint exists and holds the (finite) rolled-back parameters
    ckpt = f"{out}/checkpoints/model_parameters_epoch_02.npz"
    assert os.path.exists(ckpt)
    saved = np.load(ckpt)
    np.testing.assert_array_equal(saved["F"], np.asarray(p0.F))

    # reject_nonfinite=False preserves the old train-through behavior
    cfg_off = cfg.__class__(**{**cfg.__dict__, "reject_nonfinite": False})
    params_off, hist_off = fit_pallas(
        p0, poisoned, mu, cfg_off, key=jax.random.key(6), tile_batch=8,
        interpret=True,
    )
    assert not np.isfinite(np.asarray(params_off.Psi)).all() or not np.isfinite(
        hist_off
    ).all()


def test_epoch_kernel_bf16_planes_close_to_f32(problem):
    """bfloat16-streamed delta/error planes: kernel arithmetic stays f32,
    so the epoch tracks the f32 run within the data-quantization level
    (~0.3% relative on the stored planes)."""
    from qfa_tpu.data.loader import bf16_planes

    grid, nh, data = problem
    p0 = random_init(jax.random.key(2), grid.npix, grid.nb, nh)
    st = TrainState(p0, adam.init(p0))
    perm = jax.random.permutation(jax.random.key(3), data.size // 8)
    kw = dict(epoch=jnp.asarray(0, jnp.int32), n_batches=2, tile_batch=8,
              learning_rate=1e-2, weight_decay=0.01, interpret=True)
    out_f32 = fused_train_epoch(
        st.params, st.opt_state.m, st.opt_state.v,
        data.delta, data.error, data.zabs, perm, data.mask, **kw,
    )
    lo = bf16_planes(data)
    assert lo.delta.dtype == jnp.bfloat16 and lo.zabs.dtype == jnp.float32
    out_bf = fused_train_epoch(
        st.params, st.opt_state.m, st.opt_state.v,
        lo.delta, lo.error, data.zabs, perm, data.mask, **kw,
    )
    assert out_bf.params.F.dtype == jnp.float32  # state stays f32
    np.testing.assert_allclose(np.asarray(out_bf.loss_sums),
                               np.asarray(out_f32.loss_sums), rtol=2e-2)
    np.testing.assert_allclose(np.asarray(out_bf.params.F),
                               np.asarray(out_f32.params.F), rtol=0.1,
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(out_bf.n_real),
                               np.asarray(out_f32.n_real))


def test_fit_pallas_bf16_production_layout(problem):
    """fit_pallas end-to-end on the bf16 + zq-column + derived-mask
    production layout: loss curve within tolerance of the f32 engine."""
    from qfa_tpu.data.loader import bf16_planes
    from qfa_tpu.ops import loglam_row, zq_column
    from qfa_tpu.train import fit_pallas

    grid = qfa_tpu.make_grid(1030.0, 1090.0, 1e-3)
    nh = 4
    true = random_init(jax.random.key(0), grid.npix, grid.nb, nh)
    mu = jnp.full((grid.npix,), 1.1, jnp.float32)
    syn = generate(jax.random.key(1), true, mu, grid, 64, mask_frac=0.15)
    b = syn.to_batch(mu)
    # error-sanitized planes so the mask is derivable in-kernel
    f32_data = ResidualDataset(
        delta=b.delta * b.mask, error=b.error * b.mask,
        zabs=zq_column(syn.zqso), mask=None,
    )
    cfg = TrainConfig(n_epochs=2, batch_size=32, learning_rate=1e-2,
                      weight_decay=0.0, smooth_interval=100,
                      save_interval=100)
    p0 = random_init(jax.random.key(5), grid.npix, grid.nb, nh)
    kw = dict(key=jax.random.key(6), tile_batch=8, derive_mask=True,
              loglam=loglam_row(grid.wav), interpret=True)
    params_a, hist_a = fit_pallas(p0, f32_data, mu, cfg, **kw)
    params_b, hist_b = fit_pallas(p0, bf16_planes(f32_data), mu, cfg, **kw)
    np.testing.assert_allclose(hist_b, hist_a, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(params_b.F),
                               np.asarray(params_a.F), rtol=0.1, atol=5e-3)


def test_epoch_kernel_blue_lane_split_path():
    """Grids where round_up(nb,128) < round_up(npix,128) take the
    blue-restricted elementwise path (the tau/absorption chain runs on
    pb lanes only) — must still match the XLA epoch exactly, in both
    zabs-plane and zq-column modes."""
    from qfa_tpu.ops import loglam_row, zq_column

    grid = qfa_tpu.make_grid(1030.0, 1400.0, 5e-4)
    assert -(-grid.nb // 128) * 128 < -(-grid.npix // 128) * 128  # split
    nh = 4
    true = random_init(jax.random.key(0), grid.npix, grid.nb, nh)
    mu = jnp.full((grid.npix,), 1.1, jnp.float32)
    syn = generate(jax.random.key(1), true, mu, grid, 64, mask_frac=0.15)
    b = syn.to_batch(mu)
    data = ResidualDataset(delta=b.delta, error=b.error, zabs=b.zabs,
                           mask=b.mask)
    out, st_xla, loss_xla = run_both(grid, nh, data)
    mega_loss = float(
        jnp.sum(out.loss_sums / jnp.maximum(out.n_real, 1.0)) / 2
    )
    assert mega_loss == pytest.approx(float(loss_xla), rel=1e-5)
    for name in ("F", "Psi", "omega", "tau0", "c0", "beta"):
        np.testing.assert_allclose(
            np.asarray(getattr(out.params, name)),
            np.asarray(getattr(st_xla.params, name)),
            rtol=2e-4, atol=2e-6, err_msg=name,
        )
    # zq-column mode through the same split path
    p0 = random_init(jax.random.key(2), grid.npix, grid.nb, nh)
    st = TrainState(p0, adam.init(p0))
    perm = jax.random.permutation(jax.random.key(3), 8)
    kw = dict(epoch=jnp.asarray(0, jnp.int32), n_batches=2, tile_batch=8,
              learning_rate=1e-2, weight_decay=0.01, interpret=True)
    out_plane = fused_train_epoch(
        st.params, st.opt_state.m, st.opt_state.v,
        b.delta, b.error, b.zabs, perm, b.mask, **kw,
    )
    out_col = fused_train_epoch(
        st.params, st.opt_state.m, st.opt_state.v,
        b.delta, b.error, zq_column(syn.zqso), perm, b.mask,
        loglam=loglam_row(grid.wav), derive_zabs=True, **kw,
    )
    np.testing.assert_allclose(np.asarray(out_col.loss_sums),
                               np.asarray(out_plane.loss_sums), rtol=1e-5)
    for name in ("F", "Psi", "omega", "tau0", "c0", "beta"):
        np.testing.assert_allclose(
            np.asarray(getattr(out_col.params, name)),
            np.asarray(getattr(out_plane.params, name)),
            rtol=5e-4, atol=1e-5, err_msg=name,
        )


def test_pick_tile_batch_heuristic():
    """VMEM-aware training tiles: 256 at SDSS width, 128 at DESI width
    (compile-viable since the accumulation-dot split); the cost model may
    prefer a padded wide tile over many exact-divisor grid steps."""
    from qfa_tpu.train import pick_tile_batch

    assert pick_tile_batch(4096, 1913) == 256
    assert pick_tile_batch(1024, 9243) == 128
    # one padded 128-row window beats three exact 32-row grid steps
    assert pick_tile_batch(96, 1913) == 128
    assert pick_tile_batch(8, 9243) == 8


def test_zq_column_custom_weights():
    """zq_column's weight argument flows into the kernel's n_real."""
    from qfa_tpu.ops import loglam_row, zq_column

    grid = qfa_tpu.make_grid(1030.0, 1090.0, 1e-3)
    nh = 4
    true = random_init(jax.random.key(0), grid.npix, grid.nb, nh)
    mu = jnp.full((grid.npix,), 1.1, jnp.float32)
    syn = generate(jax.random.key(1), true, mu, grid, 64, mask_frac=0.1)
    b = syn.to_batch(mu)
    w = jnp.ones((64,)).at[:8].set(0.0)  # first 8 rows marked synthetic
    zq = zq_column(syn.zqso, weight=w)
    np.testing.assert_array_equal(np.asarray(zq[:, 1]), np.asarray(w))
    p0 = random_init(jax.random.key(2), grid.npix, grid.nb, nh)
    st = TrainState(p0, adam.init(p0))
    out = fused_train_epoch(
        st.params, st.opt_state.m, st.opt_state.v,
        b.delta, b.error, zq, jnp.arange(8), b.mask,
        loglam=loglam_row(grid.wav), derive_zabs=True,
        epoch=jnp.asarray(0, jnp.int32), n_batches=2, tile_batch=8,
        interpret=True,
    )
    assert float(jnp.sum(out.n_real)) == 56.0


def test_multi_epoch_launch_matches_chained(problem):
    """n_epochs > 1: ONE launch must equal chained single-epoch launches
    BITWISE — same math, same op order, only the dispatch cadence differs
    (the launch-amortization mode exists purely for throughput)."""
    grid, nh, data = problem
    n, tb, n_batches, n_ep = data.size, 8, 2, 4
    perms = jnp.stack(
        [
            jax.random.permutation(jax.random.key(10 + e), n // tb)
            for e in range(n_ep)
        ]
    )
    p0 = random_init(jax.random.key(2), grid.npix, grid.nb, nh)
    opt0 = adam.init(p0)
    kw = dict(
        n_batches=n_batches, tile_batch=tb, learning_rate=1e-2,
        weight_decay=0.01, interpret=True,
    )
    p, m, v = p0, opt0.m, opt0.v
    chained = []
    for e in range(n_ep):
        out = fused_train_epoch(
            p, m, v, data.delta, data.error, data.zabs, perms[e],
            data.mask, epoch=jnp.asarray(e, jnp.int32), **kw,
        )
        p, m, v = out.params, out.m, out.v
        chained.append(np.asarray(out.loss_sums))
    out2 = fused_train_epoch(
        p0, opt0.m, opt0.v, data.delta, data.error, data.zabs, perms,
        data.mask, epoch=jnp.asarray(0, jnp.int32), n_epochs=n_ep, **kw,
    )
    assert out2.loss_sums.shape == (n_ep, n_batches)
    assert out2.n_real.shape == (n_ep, n_batches)
    for e in range(n_ep):
        np.testing.assert_array_equal(
            np.asarray(out2.loss_sums[e]), chained[e], err_msg=f"epoch {e}"
        )
    for name in ("F", "Psi", "omega", "tau0", "c0", "beta"):
        np.testing.assert_array_equal(
            np.asarray(getattr(out2.params, name)),
            np.asarray(getattr(p, name)), err_msg=name,
        )
        np.testing.assert_array_equal(
            np.asarray(getattr(out2.m, name)),
            np.asarray(getattr(m, name)), err_msg=f"m.{name}",
        )
        np.testing.assert_array_equal(
            np.asarray(getattr(out2.v, name)),
            np.asarray(getattr(v, name)), err_msg=f"v.{name}",
        )


def test_fit_pallas_epochs_per_launch_matches(problem):
    """Chunked fit_pallas follows the unchunked trajectory epoch for epoch
    (chunks auto-align to the smoothing boundary; the chunk fn re-derives
    the same fold_in subkeys the per-epoch loop uses)."""
    from qfa_tpu.train import fit_pallas

    grid, nh, data = problem
    mu = jnp.full((grid.npix,), 1.1, jnp.float32)
    p0 = random_init(jax.random.key(2), grid.npix, grid.nb, nh)
    cfg = TrainConfig(
        batch_size=32, learning_rate=1e-2, weight_decay=0.01, n_epochs=7,
        smooth_interval=5, save_interval=5,
    )
    key = jax.random.key(7)
    pa, ha = fit_pallas(p0, data, mu, cfg, key=key, interpret=True)
    pb, hb = fit_pallas(
        p0, data, mu, cfg, key=key, interpret=True, epochs_per_launch=3
    )
    np.testing.assert_array_equal(ha, hb)
    for name in ("F", "Psi", "omega", "tau0", "c0", "beta"):
        np.testing.assert_array_equal(
            np.asarray(getattr(pa, name)), np.asarray(getattr(pb, name)),
            err_msg=name,
        )


def test_fit_pallas_chunked_rejects_nonfinite(problem, caplog):
    """A poisoned CHUNK rolls back to the pre-launch state (chunk-granular
    guard_nonfinite: the multi-epoch launch cannot reject mid-chunk)."""
    import logging

    from qfa_tpu.train import fit_pallas

    grid, nh, data = problem
    mu = jnp.full((grid.npix,), 1.1, jnp.float32)
    poisoned = ResidualDataset(
        delta=data.delta.at[3, 10].set(jnp.inf),
        error=data.error, zabs=data.zabs, mask=data.mask,
    )
    cfg = TrainConfig(
        n_epochs=4, batch_size=32, learning_rate=1e-2, weight_decay=0.0,
        smooth_interval=100, save_interval=100,
    )
    p0 = random_init(jax.random.key(5), grid.npix, grid.nb, nh)
    logger = logging.getLogger("test_nonfinite_chunk")
    with caplog.at_level(logging.WARNING, logger=logger.name):
        params, history = fit_pallas(
            p0, poisoned, mu, cfg, key=jax.random.key(6), tile_batch=8,
            logger=logger, interpret=True, epochs_per_launch=2,
        )
    assert len(history) == 4 and not np.isfinite(history).any()
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p0)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    rejects = [r for r in caplog.records if "rolled back" in r.message]
    assert len(rejects) == 2  # one per 2-epoch chunk


def test_mxu_bf16_mode_close_to_f32(problem):
    """``mxu_bf16`` rounds the heavy-dot operands to bfloat16 (f32
    accumulation): the multi-epoch trajectory must stay CLOSE to the f32
    engine yet actually differ — proving the casts are live (interpret
    mode rounds for real on CPU) and harmless."""
    grid, nh, data = problem
    n = data.size
    tb, n_batches, n_epochs = 8, 2, 6
    perms = jnp.concatenate([
        jax.random.permutation(jax.random.fold_in(jax.random.key(9), e),
                               n // tb)
        for e in range(n_epochs)
    ])
    p0 = random_init(jax.random.key(2), grid.npix, grid.nb, nh)
    m0 = adam.init(p0)

    def run(mxu_bf16):
        return fused_train_epoch(
            p0, m0.m, m0.v,
            data.delta, data.error, data.zabs, perms,
            epoch=jnp.asarray(0, jnp.int32),
            n_batches=n_batches, n_epochs=n_epochs, tile_batch=tb,
            learning_rate=1e-2, weight_decay=0.01,
            mxu_bf16=mxu_bf16, interpret=True,
        )

    out32, outbf = run(False), run(True)
    l32 = np.asarray(out32.loss_sums, np.float64).sum()
    lbf = np.asarray(outbf.loss_sums, np.float64).sum()
    assert lbf != l32  # the bf16 passes are actually active
    assert abs(lbf - l32) / abs(l32) < 5e-3
    for name in ("F", "Psi", "omega", "tau0", "c0", "beta"):
        a = np.asarray(getattr(outbf.params, name))
        b = np.asarray(getattr(out32.params, name))
        np.testing.assert_allclose(a, b, rtol=0.05, atol=5e-3, err_msg=name)


def test_mxu_bf16_trajectory_drift_gate(problem):
    """Default-ON parity gate: at the production learning rate (1e-3) a
    10-epoch chained bf16 trajectory tracks the identically-keyed f32 run
    within 1e-4 relative per-epoch loss on this tiny interpret-mode
    problem (measured ~4e-5 peak here; the production-scale bound is
    1e-5, enforced on real hardware every bench run — bench.py's
    ``mxu_bf16_drift_rel_55ep`` gate — where it measures ~5e-7)."""
    from qfa_tpu.train.pallas_engine import make_pallas_epoch_fn

    grid, nh, data = problem
    p0 = random_init(jax.random.key(2), grid.npix, grid.nb, nh)
    curves = {}
    for flag in (False, True):
        cfg = TrainConfig(batch_size=32, learning_rate=1e-3,
                          mxu_bf16=flag)
        fn = make_pallas_epoch_fn(cfg, tile_batch=8, interpret=True)
        st = TrainState(p0, adam.init(p0))
        curve = []
        for e in range(10):
            st, loss = fn(st, data, jax.random.fold_in(jax.random.key(7),
                                                       e))
            curve.append(float(loss))
        curves[flag] = np.asarray(curve, np.float64)
    rel = np.abs(curves[True] - curves[False]) / np.abs(curves[False])
    assert (curves[True] != curves[False]).any()  # bf16 casts are live
    assert rel.max() < 1e-4, f"per-epoch rel drift {rel}"


def test_mxu_bf16_flows_from_train_config(problem):
    """TrainConfig.mxu_bf16 reaches the Pallas engine (the config is part
    of the epoch-fn cache key, so both modes coexist in one process)."""
    from qfa_tpu.train.pallas_engine import make_pallas_epoch_fn

    grid, nh, data = problem
    p0 = random_init(jax.random.key(2), grid.npix, grid.nb, nh)
    losses = {}
    for flag in (False, True):
        cfg = TrainConfig(batch_size=32, learning_rate=1e-2,
                          mxu_bf16=flag)
        fn = make_pallas_epoch_fn(cfg, tile_batch=8, interpret=True)
        _, loss = fn(TrainState(p0, adam.init(p0)), data,
                     jax.random.key(11))
        losses[flag] = float(loss)
    assert losses[True] != losses[False]
    assert losses[True] == pytest.approx(losses[False], rel=1e-3)


def test_mxu_bf16_chunked_matches_per_epoch(problem):
    """mxu_bf16 composes with launch fusion: a 4-epoch chunk follows the
    same trajectory as 4 chained single-epoch launches of the same mode."""
    from qfa_tpu.train.pallas_engine import (
        make_pallas_chunk_fn,
        make_pallas_epoch_fn,
    )

    grid, nh, data = problem
    p0 = random_init(jax.random.key(2), grid.npix, grid.nb, nh)
    cfg = TrainConfig(batch_size=32, learning_rate=1e-2, mxu_bf16=True)
    base = jax.random.key(17)

    st_a = TrainState(p0, adam.init(p0))
    efn = make_pallas_epoch_fn(cfg, tile_batch=8, interpret=True)
    losses_a = []
    for e in range(4):
        st_a, loss = efn(st_a, data, jax.random.fold_in(base, e))
        losses_a.append(float(loss))

    cfn = make_pallas_chunk_fn(cfg, n_epochs=4, tile_batch=8,
                               interpret=True)
    st_b, losses_b = cfn(TrainState(p0, adam.init(p0)), data, base)
    np.testing.assert_array_equal(
        np.asarray(losses_b, np.float32), np.asarray(losses_a, np.float32)
    )
    for a, b in zip(jax.tree.leaves(st_a.params), jax.tree.leaves(st_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ablate_dot_splits_match_pair_stub(problem):
    """Census instrumentation: ablating dwdot+dudot together must equal
    the bwddots pair stub bitwise (same substituted planes), and unknown
    section names are rejected at the API boundary."""
    grid, nh, data = problem
    p0 = random_init(jax.random.key(2), grid.npix, grid.nb, nh)
    zeros = jax.tree.map(jnp.zeros_like, p0)
    tile_perm = jax.random.permutation(jax.random.key(3), data.size // 8)
    kw = dict(
        epoch=jnp.asarray(0, jnp.int32), n_batches=2, tile_batch=8,
        interpret=True,
    )

    out_split = fused_train_epoch(
        p0, zeros, zeros, data.delta, data.error, data.zabs, tile_perm,
        ablate=("dwdot", "dudot"), **kw,
    )
    out_pair = fused_train_epoch(
        p0, zeros, zeros, data.delta, data.error, data.zabs, tile_perm,
        ablate=("bwddots",), **kw,
    )
    for a, b in zip(jax.tree.leaves(out_split.params),
                    jax.tree.leaves(out_pair.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    with pytest.raises(ValueError, match="unknown ablate"):
        fused_train_epoch(
            p0, zeros, zeros, data.delta, data.error, data.zabs,
            tile_perm, ablate=("nonsense",), **kw,
        )


def test_ablate_xsums_additive_arm(problem):
    """The xsums census arm ADDS six reductions on top of the full
    kernel: the forward path (loss books) must be untouched, the
    gradient rows must actually change (the extra sums land in
    grows_scr — the arm is not a silent no-op the compiler could fold
    away), and combining it with a removal section is rejected."""
    grid, nh, data = problem
    p0 = random_init(jax.random.key(2), grid.npix, grid.nb, nh)
    zeros = jax.tree.map(jnp.zeros_like, p0)
    tile_perm = jax.random.permutation(jax.random.key(3), data.size // 8)
    # ONE batch: its loss books are computed from the pre-update params,
    # so they must be untouched by the extra sums (with 2+ batches the
    # second forward would already see batch 1's corrupted update)
    kw = dict(
        epoch=jnp.asarray(0, jnp.int32), n_batches=1, tile_batch=8,
        interpret=True,
    )
    out_full = fused_train_epoch(
        p0, zeros, zeros, data.delta, data.error, data.zabs, tile_perm,
        **kw,
    )
    out_x = fused_train_epoch(
        p0, zeros, zeros, data.delta, data.error, data.zabs, tile_perm,
        ablate=("xsums",), **kw,
    )
    np.testing.assert_array_equal(
        np.asarray(out_full.loss_sums), np.asarray(out_x.loss_sums)
    )
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(out_full.params),
                        jax.tree.leaves(out_x.params))
    )
    with pytest.raises(ValueError, match="ADDITIVE census arm"):
        fused_train_epoch(
            p0, zeros, zeros, data.delta, data.error, data.zabs,
            tile_perm, ablate=("xsums", "bwd"), **kw,
        )


def test_bwd_wide_bitwise_matches_two_dot_path(problem):
    """The fused single backward contraction (bwd_wide) must be BITWISE
    identical to the two-dot path on both engines: the block-diag rhs's
    zero blocks contribute exact +0.0 terms, so every partial sum matches
    (docs/CENSUS_r05.json dwdot/dudot measured the two-dot fixed issue
    cost this fusion halves)."""
    grid, nh, data = problem
    p0 = random_init(jax.random.key(2), grid.npix, grid.nb, nh)
    zeros = jax.tree.map(jnp.zeros_like, p0)
    tile_perm = jax.random.permutation(jax.random.key(3), data.size // 8)
    for engine_kw in (dict(), dict(mxu_bf16=True)):
        outs = [
            fused_train_epoch(
                p0, zeros, zeros, data.delta, data.error, data.zabs,
                tile_perm, data.mask,
                epoch=jnp.asarray(0, jnp.int32), n_batches=2,
                tile_batch=8, interpret=True, bwd_wide=wide, **engine_kw,
            )
            for wide in (False, True)
        ]
        for a, b in zip(jax.tree.leaves(outs[0].params),
                        jax.tree.leaves(outs[1].params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(
            np.asarray(outs[0].loss_sums), np.asarray(outs[1].loss_sums)
        )

    with pytest.raises(ValueError, match="dwdot/dudot"):
        fused_train_epoch(
            p0, zeros, zeros, data.delta, data.error, data.zabs,
            tile_perm, data.mask,
            epoch=jnp.asarray(0, jnp.int32), n_batches=2, tile_batch=8,
            interpret=True, bwd_wide=True, ablate=("dwdot",),
        )
