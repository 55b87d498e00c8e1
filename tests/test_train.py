"""Training loop: end-to-end convergence on synthetic data, epoch-boundary
semantics (smoothing, checkpoints, early stop)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import qfa_tpu
from qfa_tpu.data.loader import ResidualDataset
from qfa_tpu.data.synthetic import generate
from qfa_tpu.models import QFAParams, batch_nll, mean_nll, random_init
from qfa_tpu.train import TrainConfig, fit


@pytest.fixture(scope="module")
def problem():
    grid = qfa_tpu.make_grid(1030.0, 1090.0, 1e-3)
    true = random_init(jax.random.key(0), grid.npix, grid.nb, 3)
    # make the ground truth less trivial than the init constants
    true = true._replace(
        Psi=jnp.full((grid.npix,), 0.3),
        omega=jnp.full((grid.nb,), 0.5),
    )
    mu = jnp.full((grid.npix,), 1.1, jnp.float32)
    syn = generate(jax.random.key(1), true, mu, grid, 512, mask_frac=0.1)
    b = syn.to_batch(mu)
    data = ResidualDataset(delta=b.delta, error=b.error, zabs=b.zabs, mask=b.mask)
    return grid, true, mu, syn, data


def test_training_converges_toward_truth(problem):
    """Loss under the trained params must approach the loss under the true
    generating params (the generative-model recovery test, SURVEY.md §4)."""
    grid, true, mu, syn, data = problem
    cfg = TrainConfig(
        n_epochs=40,
        batch_size=128,
        learning_rate=2e-2,
        weight_decay=0.0,
        smooth_interval=1000,
        save_interval=1000,
        stop_on_negative_loss=False,
    )
    params0 = random_init(jax.random.key(9), grid.npix, grid.nb, 3)
    full_batch = syn.to_batch(mu)

    loss0 = float(mean_nll(params0, full_batch))
    loss_true = float(mean_nll(true, full_batch))
    params, history = fit(params0, data, mu, cfg, key=jax.random.key(10))
    loss_final = float(mean_nll(params, full_batch))

    assert history[-1] < history[0], "training must reduce the loss"
    # close most of the gap between random init and the generating params
    assert (loss0 - loss_final) > 0.85 * (loss0 - loss_true), (
        loss0, loss_final, loss_true,
    )


def test_checkpoints_and_history(problem, tmp_path):
    grid, _, mu, _, data = problem
    cfg = TrainConfig(
        n_epochs=4, batch_size=128, learning_rate=1e-2, weight_decay=0.0,
        smooth_interval=2, save_interval=2, stop_on_negative_loss=False,
    )
    params0 = random_init(jax.random.key(3), grid.npix, grid.nb, 3)
    out = str(tmp_path / "run")
    params, history = fit(params0, data, mu, cfg, output_dir=out)
    assert len(history) == 4
    assert os.path.exists(f"{out}/checkpoints/model_parameters_epoch_02.npz")
    assert os.path.exists(f"{out}/checkpoints/model_parameters_epoch_04.npz")


def test_early_stop_on_negative_loss(problem, tmp_path):
    """A dataset with tiny residuals drives the NLL negative -> early stop +
    smooth + save (reference semantics)."""
    grid, _, mu, _, _ = problem
    n = 128
    nb = grid.nb
    tiny = ResidualDataset(
        delta=jnp.zeros((n, grid.npix)) + 1e-4,
        error=jnp.full((n, grid.npix), 1e-3),
        zabs=jnp.full((n, nb), 2.5),
        mask=jnp.ones((n, grid.npix)),
    )
    cfg = TrainConfig(
        n_epochs=50, batch_size=64, learning_rate=1e-2, weight_decay=0.0,
        smooth_interval=1000, save_interval=1000,
    )
    params0 = random_init(jax.random.key(4), grid.npix, grid.nb, 3)
    out = str(tmp_path / "early")
    params, history = fit(params0, tiny, mu, cfg, output_dir=out)
    assert len(history) < 50, "must early-stop"
    assert history[-1] < 0
    ckpts = os.listdir(f"{out}/checkpoints")
    # the early-stop save: interop npz + full-state snapshot
    assert sorted(ckpts) == [
        f"model_parameters_epoch_{len(history):02d}.npz",
        f"state_epoch_{len(history):02d}.npz",
    ]


def test_clip_active_during_training(problem):
    grid, _, mu, _, data = problem
    cfg = TrainConfig(
        n_epochs=2, batch_size=128, learning_rate=0.5,  # huge LR forces clipping
        weight_decay=0.0, smooth_interval=1000, save_interval=1000,
        stop_on_negative_loss=False,
    )
    params0 = random_init(jax.random.key(5), grid.npix, grid.nb, 3)
    params, _ = fit(params0, data, mu, cfg)
    assert float(jnp.min(params.Psi)) >= 1e-3
    assert float(jnp.max(params.Psi)) <= 2.0
    assert float(jnp.min(params.omega)) >= 1e-3
    assert 0.0 <= float(params.tau0) <= 1.0
    assert 0.1 <= float(params.beta) <= 5.0


def test_nonfinite_update_rejected(problem):
    """A poisoned batch (NaN delta) must not move parameters or moments."""
    import jax.numpy as jnp
    from qfa_tpu.train import TrainState, adam
    from qfa_tpu.train.loop import make_epoch_fn
    from qfa_tpu.data.loader import batch_indices

    grid, _, mu, _, data = problem
    bad = data._replace(
        delta=data.delta.at[0, 0].set(jnp.nan)
    )
    cfg = TrainConfig(
        n_epochs=1, batch_size=data.size, learning_rate=1e-2,
        weight_decay=0.0, stop_on_negative_loss=False,
    )
    params0 = random_init(jax.random.key(7), grid.npix, grid.nb, 3)
    st = TrainState(params0, adam.init(params0))
    idx = batch_indices(jax.random.key(0), data.size, data.size)
    st2, loss = make_epoch_fn(cfg)(st, bad, idx)
    # loss is NaN but parameters stayed exactly at init
    assert not np.isfinite(float(loss))
    params_ref = random_init(jax.random.key(7), grid.npix, grid.nb, 3)
    np.testing.assert_array_equal(np.asarray(st2.params.F), np.asarray(params_ref.F))
    np.testing.assert_array_equal(np.asarray(st2.opt_state.m.F), 0.0)


def test_full_state_checkpoint_roundtrip(problem, tmp_path):
    from qfa_tpu.train import TrainState, adam, load_state, save_state, latest_checkpoint
    from qfa_tpu.train.loop import make_epoch_fn
    from qfa_tpu.data.loader import batch_indices

    grid, _, mu, _, data = problem
    cfg = TrainConfig(n_epochs=1, batch_size=128, learning_rate=1e-2,
                      weight_decay=0.0, stop_on_negative_loss=False)
    params0 = random_init(jax.random.key(8), grid.npix, grid.nb, 3)
    st = TrainState(params0, adam.init(params0))
    idx = batch_indices(jax.random.key(1), data.size, cfg.batch_size)
    epoch_fn = make_epoch_fn(cfg)
    st, _ = epoch_fn(st, data, idx)

    path = str(tmp_path / "ck" / "state_epoch_0001.npz")
    save_state(path, st, mu)
    st2, mu2 = load_state(path)
    assert int(st2.opt_state.epoch) == int(st.opt_state.epoch) == 1
    for a, b in zip(jax.tree.leaves(st.params), jax.tree.leaves(st2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(st.opt_state.m), jax.tree.leaves(st2.opt_state.m)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(mu2), np.asarray(mu), rtol=1e-6)

    # resumed trajectory == uninterrupted trajectory
    idx2 = batch_indices(jax.random.key(2), data.size, cfg.batch_size)
    st_cont, _ = epoch_fn(st, data, idx2)
    idx2b = batch_indices(jax.random.key(2), data.size, cfg.batch_size)
    st_res, _ = epoch_fn(st2, data, idx2b)
    for a, b in zip(jax.tree.leaves(st_cont.params), jax.tree.leaves(st_res.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)
    assert latest_checkpoint(str(tmp_path / "ck")) == path


def test_fit_streaming_matches_resident_loss_scale(problem):
    """Streaming (host-prefetch) training must converge like the resident
    path on the same data."""
    from qfa_tpu.train import fit_streaming
    from qfa_tpu.data.streaming import HostResiduals

    grid, _, mu, syn, data = problem
    host = HostResiduals(
        delta=np.asarray(data.delta),
        error=np.asarray(data.error),
        zabs=np.asarray(data.zabs),
        mask=np.asarray(data.mask),
    )
    cfg = TrainConfig(
        n_epochs=6, batch_size=128, learning_rate=2e-2, weight_decay=0.0,
        smooth_interval=1000, save_interval=1000, stop_on_negative_loss=False,
    )
    params0 = random_init(jax.random.key(11), grid.npix, grid.nb, 3)
    params_s, hist_s = fit_streaming(params0, host, mu, cfg, seed=1)
    assert hist_s[-1] < hist_s[0]

    params0b = random_init(jax.random.key(11), grid.npix, grid.nb, 3)
    from qfa_tpu.train import fit as fit_resident
    params_r, hist_r = fit_resident(params0b, data, mu, cfg, key=jax.random.key(1))
    # different shuffles -> not identical, but same loss scale after 6 epochs
    assert abs(hist_s[-1] - hist_r[-1]) < 0.05 * abs(hist_r[-1])


def test_sliced_epoch_matches_gathered_epoch(problem):
    """Sliced (zero-copy) epochs equal gathered epochs when the gather
    indices are the same contiguous blocks."""
    from qfa_tpu.train import TrainState, adam
    from qfa_tpu.train.loop import (
        make_epoch_fn,
        make_sliced_epoch_fn,
        reshuffle_dataset,
    )

    grid, _, mu, _, data = problem
    b = 128
    n_batches = data.size // b
    cfg = TrainConfig(batch_size=b, learning_rate=1e-2, weight_decay=0.01)

    order = np.random.default_rng(0).permutation(n_batches)
    offsets = jnp.asarray(order * b, jnp.int32)
    idx = jnp.stack([jnp.arange(o, o + b) for o in order * b])

    p0 = random_init(jax.random.key(12), grid.npix, grid.nb, 3)
    st_g, loss_g = make_epoch_fn(cfg)(TrainState(p0, adam.init(p0)), data, idx)
    p0b = random_init(jax.random.key(12), grid.npix, grid.nb, 3)
    st_s, loss_s = make_sliced_epoch_fn(cfg)(
        TrainState(p0b, adam.init(p0b)), data, offsets
    )
    assert float(loss_s) == pytest.approx(float(loss_g), rel=1e-6)
    for a, c in zip(jax.tree.leaves(st_g.params), jax.tree.leaves(st_s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-5, atol=1e-7)

    # reshuffle keeps the multiset of rows
    data2 = reshuffle_dataset(
        jax.tree.map(jnp.copy, data), jax.random.key(5)
    )
    np.testing.assert_allclose(
        np.sort(np.asarray(data2.delta).ravel()),
        np.sort(np.asarray(data.delta).ravel()),
        atol=0,
    )


def test_epoch_indices_cover_every_spectrum():
    """Full-coverage epoch indices: every row exactly once, pads weight-0
    (the reference trains the tail batch,
    /root/reference/QFA/dataloader.py:132-138)."""
    from qfa_tpu.data.loader import epoch_indices

    ei = epoch_indices(jax.random.key(0), 37, 16)
    assert ei.idx.shape == (3, 16) and ei.weight.shape == (3, 16)
    real = np.asarray(ei.idx)[np.asarray(ei.weight) > 0]
    assert sorted(real.tolist()) == list(range(37))
    assert float(np.asarray(ei.weight).sum()) == 37.0


def test_tail_batch_equals_padded_step(problem):
    """A pure-tail epoch (n < batch_size) must produce exactly the update of
    the explicitly padded single step — weight-0 pad rows contribute nothing."""
    from qfa_tpu.data.batch import pad_batch
    from qfa_tpu.data.loader import epoch_indices
    from qfa_tpu.train import TrainState, adam
    from qfa_tpu.train.loop import make_epoch_fn, make_step_fn

    grid, true, mu, syn, data = problem
    small = ResidualDataset(*(leaf[:8] for leaf in data))
    cfg = TrainConfig(batch_size=16, learning_rate=1e-2, weight_decay=0.01)

    p0 = random_init(jax.random.key(9), grid.npix, grid.nb, 3)
    ei = epoch_indices(jax.random.key(10), 8, 16)
    st_epoch, loss_epoch = make_epoch_fn(cfg)(
        TrainState(p0, adam.init(p0)), small, ei.idx, ei.weight
    )

    p0b = random_init(jax.random.key(9), grid.npix, grid.nb, 3)
    batch = small.gather(ei.idx[0, :8])
    st_step, loss_step = make_step_fn(cfg)(
        TrainState(p0b, adam.init(p0b)), pad_batch(batch, 16)
    )

    assert float(loss_epoch) == pytest.approx(float(loss_step), rel=1e-6)
    for a, b in zip(jax.tree.leaves(st_epoch.params), jax.tree.leaves(st_step.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_fit_trains_tail_batch(problem):
    """fit() on a non-multiple dataset trains the tail batch: a pixel
    observed ONLY by the rows that land in epoch 0's (padded) tail batch
    receives a nonzero gradient. Replicates fit's shuffle key to learn
    which rows those are; with weight_decay=0, dropping the tail would
    leave that pixel's Psi bitwise unchanged."""
    from qfa_tpu.data.loader import epoch_indices

    grid, true, mu, syn, data = problem
    small = ResidualDataset(*(leaf[:40] for leaf in data))
    key = jax.random.key(12)
    ei = epoch_indices(jax.random.fold_in(key, 0), 40, 16)
    idx, wt = np.asarray(ei.idx), np.asarray(ei.weight)
    tail_rows = idx[-1][wt[-1] > 0]
    assert 0 < len(tail_rows) < 16  # 40 % 16 = 8 real rows in the tail
    j = 5
    mask = np.array(small.mask)
    mask[:, j] = 0.0
    mask[tail_rows, j] = 1.0
    small = small._replace(mask=jnp.asarray(mask))
    cfg = TrainConfig(n_epochs=1, batch_size=16, learning_rate=1e-2,
                      weight_decay=0.0, smooth_interval=100)
    p0 = random_init(jax.random.key(11), grid.npix, grid.nb, 3)
    psi_j_before = float(p0.Psi[j])  # fit donates the state's buffers
    params, history = fit(p0, small, mu, cfg, key=key)
    assert np.isfinite(history).all()
    assert abs(float(params.Psi[j]) - psi_j_before) > 1e-7


def test_dp_epoch_with_dataset_padding_rows():
    """shard_epoch_indices(n_real=...) zero-weights dataset padding rows."""
    from qfa_tpu.parallel import make_mesh, shard_epoch_indices

    mesh = make_mesh(4)
    ei = shard_epoch_indices(jax.random.key(0), 48, 16, mesh, n_real=41)
    idx = np.asarray(jax.device_get(ei.idx))   # (4, nb, 4) local indices
    wt = np.asarray(jax.device_get(ei.weight))
    shard_n = 48 // 4
    global_idx = idx + (np.arange(4) * shard_n)[:, None, None]
    # every real row exactly once with weight 1; padding rows weight 0
    real = np.sort(global_idx[wt > 0].ravel())
    assert real.tolist() == list(range(41))
    assert (wt[global_idx >= 41] == 0).all()


def test_fit_streaming_first_class(problem, tmp_path):
    """Streaming epochs: checkpoints + validation + tail batch + exact
    kill-and-resume trajectory equality."""
    from qfa_tpu.data.streaming import HostResiduals
    from qfa_tpu.train import fit_streaming
    from qfa_tpu.train.checkpoint import latest_checkpoint, load_state

    grid, true, mu, syn, data = problem
    host = HostResiduals(
        delta=np.asarray(data.delta[:40]),
        error=np.asarray(data.error[:40]),
        zabs=np.asarray(data.zabs[:40]),
        mask=np.asarray(data.mask[:40]),
    )  # 40 spectra, batch 16 -> tail batch of 8
    val = ResidualDataset(*(leaf[40:56] for leaf in data))
    cfg = TrainConfig(n_epochs=4, batch_size=16, learning_rate=1e-2,
                      weight_decay=0.0, smooth_interval=2, save_interval=2)
    p0 = random_init(jax.random.key(21), grid.npix, grid.nb, 3)

    out_a = str(tmp_path / "stream_a")
    params_a, hist_a = fit_streaming(
        p0, host, mu, cfg, seed=5, output_dir=out_a, val_data=val
    )
    assert len(hist_a) == 4 and np.isfinite(hist_a).all()
    assert os.path.exists(f"{out_a}/checkpoints/model_parameters_epoch_02.npz")
    assert os.path.exists(f"{out_a}/checkpoints/state_epoch_04.npz")

    # kill after 2 epochs, resume to 4 -> identical trajectory
    import dataclasses

    out_b = str(tmp_path / "stream_b")
    cfg2 = dataclasses.replace(cfg, n_epochs=2)
    p0b = random_init(jax.random.key(21), grid.npix, grid.nb, 3)
    fit_streaming(p0b, host, mu, cfg2, seed=5, output_dir=out_b)
    ckpt = latest_checkpoint(f"{out_b}/checkpoints")
    state, _ = load_state(ckpt)
    assert int(state.opt_state.epoch) == 2
    params_b, hist_b = fit_streaming(
        None, host, mu, cfg, seed=5, output_dir=out_b, initial_state=state
    )
    assert len(hist_b) == 2
    for a, b in zip(jax.tree.leaves(params_a), jax.tree.leaves(params_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_stream_batches_tail_coverage(problem):
    """Every spectrum is served exactly once per epoch, pads weight-0."""
    from qfa_tpu.data.streaming import HostResiduals, stream_batches

    grid, true, mu, syn, data = problem
    host = HostResiduals(
        delta=np.asarray(data.delta[:37]),
        error=np.asarray(data.error[:37]),
        zabs=np.asarray(data.zabs[:37]),
        mask=np.asarray(data.mask[:37]),
    )
    rng = np.random.default_rng(0)
    served = []
    total_w = 0.0
    for batch in stream_batches(host, 16, rng):
        w = np.asarray(batch.weight)
        total_w += w.sum()
        served.append(np.asarray(batch.delta)[w > 0])
    assert total_w == 37.0
    served = np.concatenate(served)
    # every row appears exactly once (match rows by content)
    src = np.asarray(host.delta)
    matched = sorted(
        int(np.argmin(np.abs(src - row).sum(axis=1))) for row in served
    )
    assert matched == list(range(37))


def test_xla_engines_accept_bf16_planes():
    """bf16-stored residual planes (capacity mode) run through the XLA
    epoch engines with f32 arithmetic — losses track the f32 storage run
    within the data-quantization level."""
    import qfa_tpu
    from qfa_tpu.data.loader import ResidualDataset, bf16_planes
    from qfa_tpu.data.synthetic import generate
    from qfa_tpu.models import random_init
    from qfa_tpu.train import TrainConfig, TrainState, adam
    from qfa_tpu.train.loop import make_epoch_fn
    from qfa_tpu.data.loader import batch_indices

    grid = qfa_tpu.make_grid(1030.0, 1090.0, 1e-3)
    true = random_init(jax.random.key(0), grid.npix, grid.nb, 3)
    mu = jnp.full((grid.npix,), 1.1, jnp.float32)
    syn = generate(jax.random.key(1), true, mu, grid, 32, mask_frac=0.1)
    b = syn.to_batch(mu)
    data = ResidualDataset(delta=b.delta, error=b.error, zabs=b.zabs,
                           mask=b.mask)
    cfg = TrainConfig(batch_size=16, learning_rate=1e-2, weight_decay=0.0)
    idx = batch_indices(jax.random.key(2), 32, 16)
    p0 = random_init(jax.random.key(3), grid.npix, grid.nb, 3)
    epoch_fn = make_epoch_fn(cfg)  # donates its TrainState: fresh each run
    _, loss_f32 = epoch_fn(TrainState(p0, adam.init(p0)), data, idx)
    p1 = random_init(jax.random.key(3), grid.npix, grid.nb, 3)
    _, loss_bf = epoch_fn(
        TrainState(p1, adam.init(p1)), bf16_planes(data), idx
    )
    assert float(loss_bf) == pytest.approx(float(loss_f32), rel=2e-2)
