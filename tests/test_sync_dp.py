"""Exact-DP at launch cadence (parallel.sync_dp) vs the other engines.

VERDICT r3 weak #5: the middle ground between per-batch exact DP
(parallel.dp, dispatch-bound) and per-epoch local SGD (parallel.epoch_dp).
Pinned here: (a) trajectory equality with the plain whole-epoch kernel on
one device at EVERY window cadence, (b) trajectory equality with
parallel.dp's per-batch psum engine on a real (virtual) mesh at K=1 on
identical batch compositions, (c) multi-epoch chaining semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import qfa_tpu
from qfa_tpu.data.loader import EpochIndices, ResidualDataset
from qfa_tpu.data.synthetic import generate
from qfa_tpu.models import random_init
from qfa_tpu.ops.epoch_kernel import fused_train_epoch
from qfa_tpu.parallel import (
    make_dp_epoch_fn,
    make_mesh,
    make_sync_dp_epoch_fn,
    shard_dataset,
    sync_dp_train_epoch,
)
from qfa_tpu.train import TrainConfig, TrainState, adam


@pytest.fixture(scope="module")
def problem():
    grid = qfa_tpu.make_grid(1030.0, 1080.0, 1e-3)
    true = random_init(jax.random.key(0), grid.npix, grid.nb, 4)
    mu = jnp.ones((grid.npix,), jnp.float32)
    syn = generate(jax.random.key(1), true, mu, grid, 128, mask_frac=0.15)
    b = syn.to_batch(mu)
    data = ResidualDataset(delta=b.delta, error=b.error, zabs=b.zabs,
                           mask=b.mask)
    return grid, data


def fresh_state(grid, nh=4, seed=2):
    p = random_init(jax.random.key(seed), grid.npix, grid.nb, nh)
    return TrainState(p, adam.init(p))


def assert_params_close(a, b, rtol, atol=2e-6):
    for name in ("F", "Psi", "omega", "tau0", "c0", "beta"):
        np.testing.assert_allclose(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            rtol=rtol, atol=atol, err_msg=name,
        )


CFG = dict(learning_rate=1e-2, weight_decay=0.01)


def test_sync_dp_single_device_matches_plain_epoch(problem):
    """K=1 on one device == the plain whole-epoch kernel on the same tile
    permutation: the deferred psum'd updates run through the identical
    in-kernel epilogue, so the trajectories coincide."""
    grid, data = problem
    mesh = make_mesh(1)
    cfg = TrainConfig(batch_size=32, **CFG)
    key = jax.random.key(7)
    st, loss = make_sync_dp_epoch_fn(cfg, mesh, tile_batch=8,
                                     interpret=True)(
        fresh_state(grid), shard_dataset(data, mesh), key
    )
    assert np.isfinite(float(loss))

    # plain engine with the engine's own per-device (dev=0) permutation
    perm = jax.random.permutation(
        jax.random.fold_in(key, jnp.asarray(0, jnp.uint32)), 128 // 8
    )
    st0 = fresh_state(grid)
    out = fused_train_epoch(
        st0.params, st0.opt_state.m, st0.opt_state.v,
        data.delta, data.error, data.zabs, perm, data.mask,
        epoch=st0.opt_state.epoch, n_batches=128 // 32, tile_batch=8,
        interpret=True, **CFG,
    )
    assert_params_close(st.params, out.params, rtol=1e-5)
    # reported loss: same batch-mean bookkeeping
    plain_loss = float(
        jnp.sum(out.loss_sums / jnp.maximum(out.n_real, 1.0)) / 4
    )
    assert float(loss) == pytest.approx(plain_loss, rel=1e-5)


@pytest.mark.parametrize("k", [2, 4, 3])
def test_sync_dp_window_cadence_invariant_single_device(problem, k):
    """On one device the window cadence is a pure launch-batching knob:
    K>1 (including a remainder window, K=3 over 4 batches) reproduces the
    K=1 trajectory exactly."""
    grid, data = problem
    mesh = make_mesh(1)
    cfg = TrainConfig(batch_size=32, **CFG)
    key = jax.random.key(9)
    sharded = shard_dataset(data, mesh)
    st1, loss1 = make_sync_dp_epoch_fn(
        cfg, mesh, tile_batch=8, batches_per_launch=1, interpret=True
    )(fresh_state(grid), sharded, key)
    stk, lossk = make_sync_dp_epoch_fn(
        cfg, mesh, tile_batch=8, batches_per_launch=k, interpret=True
    )(fresh_state(grid), sharded, key)
    assert float(lossk) == pytest.approx(float(loss1), rel=1e-6)
    assert_params_close(stk.params, st1.params, rtol=1e-6, atol=1e-7)


def test_sync_dp_exact_matches_per_batch_dp_on_mesh(problem):
    """K=1 on a 2-device mesh == parallel.dp's per-batch psum engine on
    IDENTICAL batch compositions: every optimizer step consumes the same
    globally-summed gradient (cross-engine tolerance: kernel math vs XLA
    autodiff)."""
    grid, data = problem
    ndev = 2
    mesh = make_mesh(ndev)
    b_global, tb = 32, 8
    b_local = b_global // ndev  # 16 rows -> 2 tiles per batch
    tpb = b_local // tb
    n_local = 128 // ndev
    n_batches = n_local // b_local
    cfg = TrainConfig(batch_size=b_global, reject_nonfinite=False, **CFG)
    key = jax.random.key(11)
    sharded = shard_dataset(data, mesh)

    st_sync, loss_sync = make_sync_dp_epoch_fn(
        cfg, mesh, tile_batch=tb, interpret=True
    )(fresh_state(grid), sharded, key)

    # reconstruct the engine's per-device tile perms -> dp row indices
    idx = np.zeros((ndev, n_batches, b_local), np.int32)
    for dev in range(ndev):
        perm = np.asarray(jax.random.permutation(
            jax.random.fold_in(key, jnp.asarray(dev, jnp.uint32)),
            n_batches * tpb,
        ))
        rows = np.concatenate(
            [np.arange(t * tb, (t + 1) * tb) for t in perm]
        )
        idx[dev] = rows.reshape(n_batches, b_local)
    ei = EpochIndices(
        idx=jnp.asarray(idx),
        weight=jnp.ones((ndev, n_batches, b_local), jnp.float32),
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = NamedSharding(mesh, P(mesh.axis_names[0], None, None))
    ei = EpochIndices(idx=jax.device_put(ei.idx, spec),
                      weight=jax.device_put(ei.weight, spec))
    st_dp, loss_dp = make_dp_epoch_fn(cfg, mesh)(
        fresh_state(grid), sharded, ei
    )
    assert float(loss_sync) == pytest.approx(float(loss_dp), rel=1e-5)
    assert_params_close(st_sync.params, st_dp.params, rtol=2e-4)
    # moments too: the engines share the whole optimizer trajectory
    assert_params_close(st_sync.opt_state.m, st_dp.opt_state.m, rtol=2e-3)


def replica_arrays(x):
    """Per-device copies of a replicated array (one per mesh device)."""
    return [np.asarray(s.data) for s in x.addressable_shards]


def assert_replicas_bit_identical(state):
    """Every param/moment leaf holds the SAME bits on every device."""
    for leaf in jax.tree.leaves((state.params, state.opt_state.m,
                                 state.opt_state.v)):
        reps = replica_arrays(leaf)
        assert len(reps) > 1
        for r in reps[1:]:
            np.testing.assert_array_equal(r, reps[0])


@pytest.mark.parametrize("k", [4, 3])
def test_sync_dp_k_gt_1_multi_device_resync_and_bounded_drift(problem, k):
    """The documented K>1 multi-device contract (VERDICT r4 weak #5):
    interior batches of a window update locally (replicas drift WITHIN
    the window, so the trajectory genuinely differs from K=1), and every
    window boundary's psum re-sync leaves the replicas bit-identical —
    pinned here by reading each device's copy of the replicated state.
    K=3 over 4 batches also exercises the remainder window's re-sync.
    Drift vs the K=1 exact-DP trajectory stays bounded."""
    grid, data = problem
    ndev = 2
    mesh = make_mesh(ndev)
    cfg = TrainConfig(batch_size=32, **CFG)  # 4 global batches of 128 rows
    key = jax.random.key(13)
    sharded = shard_dataset(data, mesh)

    st1, loss1 = make_sync_dp_epoch_fn(
        cfg, mesh, tile_batch=8, batches_per_launch=1, interpret=True
    )(fresh_state(grid), sharded, key)
    stk, lossk = make_sync_dp_epoch_fn(
        cfg, mesh, tile_batch=8, batches_per_launch=k, interpret=True
    )(fresh_state(grid), sharded, key)

    # (a) the epoch's final window boundary re-synced the replicas:
    # params AND Adam moments bit-identical on both devices
    assert_replicas_bit_identical(stk)

    # (b) interior batches really did update locally: the K>1 trajectory
    # is NOT the K=1 trajectory (otherwise this test pins nothing)
    diffs = [
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(jax.tree.leaves(stk.params),
                        jax.tree.leaves(st1.params))
    ]
    assert max(diffs) > 0.0

    # (c) ... but the drift vs exact DP is bounded (elementwise bounds
    # are the wrong yardstick here — near-zero F entries make relative
    # drift unbounded; the contract is bulk-trajectory closeness):
    # relative Frobenius drift < 10% per leaf, loss within 5%
    for name in ("F", "Psi", "omega", "c0", "beta"):
        a = np.asarray(getattr(stk.params, name), np.float64)
        b = np.asarray(getattr(st1.params, name), np.float64)
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)
        assert rel < 0.10, (name, rel)
    assert float(lossk) == pytest.approx(float(loss1), rel=0.05)


def test_sync_dp_k_gt_1_resync_at_every_boundary(problem):
    """Chained epochs with ONE window per epoch observe the re-sync at
    every successive window boundary, not just the last: after each
    epoch the replicas must again be bit-identical."""
    grid, data = problem
    mesh = make_mesh(2)
    cfg = TrainConfig(batch_size=32, **CFG)
    fn = make_sync_dp_epoch_fn(cfg, mesh, tile_batch=8,
                               batches_per_launch=4, interpret=True)
    st = fresh_state(grid)
    sharded = shard_dataset(data, mesh)
    for epoch in range(2):
        st, loss = fn(st, sharded, jax.random.fold_in(jax.random.key(17),
                                                      epoch))
        assert np.isfinite(float(loss))
        assert_replicas_bit_identical(st)


def test_sync_dp_multi_epoch_chaining(problem):
    """Chained epochs advance the per-epoch Adam counter and learn."""
    grid, data = problem
    mesh = make_mesh(4)
    cfg = TrainConfig(batch_size=32, **CFG)
    fn = make_sync_dp_epoch_fn(cfg, mesh, tile_batch=8,
                               batches_per_launch=2, interpret=True)
    st = fresh_state(grid)
    sharded = shard_dataset(data, mesh)
    losses = []
    for epoch in range(3):
        st, loss = fn(st, sharded, jax.random.fold_in(jax.random.key(5),
                                                      epoch))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert int(st.opt_state.epoch) == 3
    for leaf in jax.tree.leaves(st.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_fit_pallas_dp_exact_end_to_end(problem):
    """The full training loop (fit_pallas) drives the exact-DP engine:
    dataset padding/sharding, replicated state placement, NaN rollback
    hooks and loss history all compose with parallel.sync_dp."""
    from qfa_tpu.train.pallas_engine import fit_pallas

    grid, data = problem
    mesh = make_mesh(2)
    cfg = TrainConfig(batch_size=32, n_epochs=4, smooth_interval=100,
                      **CFG)
    p0 = random_init(jax.random.key(3), grid.npix, grid.nb, 4)
    mu = jnp.ones((grid.npix,), jnp.float32)
    params, history = fit_pallas(
        p0, data, mu, cfg, key=jax.random.key(6), tile_batch=8,
        mesh=mesh, dp_exact=True, batches_per_launch=2, interpret=True,
    )
    assert len(history) == 4
    assert np.isfinite(history).all()
    assert history[-1] < history[0]  # it learns
    for leaf in jax.tree.leaves(params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_fit_pallas_dp_exact_guards(problem):
    from qfa_tpu.train.pallas_engine import fit_pallas

    grid, data = problem
    p0 = random_init(jax.random.key(3), grid.npix, grid.nb, 4)
    mu = jnp.ones((grid.npix,), jnp.float32)
    cfg = TrainConfig(batch_size=32, n_epochs=1, **CFG)
    with pytest.raises(ValueError, match="requires a mesh"):
        fit_pallas(p0, data, mu, cfg, tile_batch=8, dp_exact=True,
                   interpret=True)
    with pytest.raises(ValueError, match="epochs_per_launch"):
        fit_pallas(p0, data, mu, cfg, tile_batch=8, mesh=make_mesh(2),
                   dp_exact=True, epochs_per_launch=2, interpret=True)


def test_sync_dp_train_epoch_helper(problem):
    grid, data = problem
    mesh = make_mesh(1)
    cfg = TrainConfig(batch_size=64, **CFG)
    st, loss = sync_dp_train_epoch(
        fresh_state(grid), shard_dataset(data, mesh), jax.random.key(3),
        cfg, mesh, tile_batch=8, interpret=True,
    )
    assert isinstance(loss, float) and np.isfinite(loss)
