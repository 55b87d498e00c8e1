"""Fused Pallas training step vs autodiff through the XLA path.

Runs in Pallas interpreter mode on CPU — the same kernel code that compiles
to Mosaic on TPU (where it was additionally validated against autodiff on
real hardware: loss exact, gradients to ~4e-6 relative).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import qfa_tpu
from qfa_tpu.data.batch import pad_batch
from qfa_tpu.data.synthetic import generate
from qfa_tpu.models import random_init
from qfa_tpu.models.qfa import ModelOptions, summed_stats
from qfa_tpu.ops.fused_step import TAU_LAW_ABC, fused_loss_grads


@pytest.fixture(scope="module")
def problem():
    grid = qfa_tpu.make_grid(1030.0, 1300.0, 1e-3)  # blue + red side
    params = random_init(jax.random.key(0), grid.npix, grid.nb, 8)
    params = params._replace(
        tau0=jnp.asarray(0.15), c0=jnp.asarray(0.24), beta=jnp.asarray(1.33)
    )
    mu = jnp.ones((grid.npix,), jnp.float32)
    syn = generate(jax.random.key(1), params, mu, grid, 16, mask_frac=0.25)
    return grid, params, mu, syn


def assert_grads_match(grads_x, grads_p, rel=1e-4):
    for name in QFA_FIELDS:
        gx = np.asarray(getattr(grads_x, name))
        gp = np.asarray(getattr(grads_p, name))
        scale = np.max(np.abs(gx)) + 1e-12
        np.testing.assert_allclose(
            gp, gx, rtol=0, atol=rel * scale, err_msg=name
        )


QFA_FIELDS = ("F", "Psi", "omega", "tau0", "c0", "beta")


def test_matches_autodiff(problem):
    grid, params, mu, syn = problem
    batch = syn.to_batch(mu)
    total_x, _n, grads_x, counts_x = summed_stats(params, batch)
    out = fused_loss_grads(params, batch, tile_batch=8, interpret=True)
    assert float(out.loss_sum) == pytest.approx(float(total_x), rel=1e-6)
    assert_grads_match(grads_x, out.grads)
    np.testing.assert_allclose(
        np.asarray(out.counts.pix), np.asarray(counts_x.pix)
    )
    assert float(out.counts.scalar) == float(counts_x.scalar)


def test_padded_rows_are_neutral(problem):
    grid, params, mu, syn = problem
    batch = pad_batch(syn.to_batch(mu), 24)
    total_x, _n, grads_x, _ = summed_stats(params, batch)
    out = fused_loss_grads(params, batch, tile_batch=8, interpret=True)
    assert float(out.loss_sum) == pytest.approx(float(total_x), rel=1e-6)
    assert_grads_match(grads_x, out.grads)


@pytest.mark.parametrize("law", sorted(TAU_LAW_ABC))
def test_all_tau_laws(problem, law):
    grid, params, mu, syn = problem
    batch = syn.to_batch(mu)
    opts = ModelOptions(tau_which=law)
    total_x, _n, grads_x, _ = summed_stats(params, batch, opts)
    out = fused_loss_grads(params, batch, tau_which=law, tile_batch=8,
                           interpret=True)
    assert float(out.loss_sum) == pytest.approx(float(total_x), rel=1e-6)
    assert_grads_match(grads_x, out.grads)


def test_tau_law_abc_matches_physics():
    """The kernel's a*(1+z)^b + c parametrization must equal the physics
    module's tau laws on the fly."""
    from qfa_tpu.physics import TAU_LAWS

    z = jnp.linspace(2.0, 4.0, 7)
    for name, (a, b, c) in TAU_LAW_ABC.items():
        direct = np.asarray(TAU_LAWS[name](z))
        abc = a * (1.0 + np.asarray(z)) ** b + c
        np.testing.assert_allclose(abc, direct, rtol=1e-6)


def test_uneven_tile_pads_with_inert_rows(problem):
    """Batches that are not a tile multiple are padded internally with
    fully-masked rows (r4: any batch size must train — the reference
    default 500 has no aligned divisor); outputs match the exact-tile run."""
    grid, params, mu, syn = problem
    batch = syn.to_batch(mu)  # 16 rows
    out5 = fused_loss_grads(params, batch, tile_batch=5, interpret=True)
    out8 = fused_loss_grads(params, batch, tile_batch=8, interpret=True)
    assert float(out5.loss_sum) == pytest.approx(float(out8.loss_sum),
                                                 rel=1e-6)
    np.testing.assert_allclose(np.asarray(out5.grads.Psi),
                               np.asarray(out8.grads.Psi),
                               rtol=1e-5, atol=1e-7)


def test_pallas_step_fn_matches_xla_step(problem):
    """The Pallas-backed training step produces the same update as the XLA
    step (interpret mode on CPU)."""
    import qfa_tpu
    from qfa_tpu.train import TrainConfig, TrainState, adam
    from qfa_tpu.train.loop import make_pallas_step_fn, make_step_fn

    grid, params, mu, syn = problem
    batch = syn.to_batch(mu)
    cfg = TrainConfig(batch_size=16, learning_rate=1e-2, weight_decay=0.01)

    # the step functions donate their state: give each its own copy
    p1 = jax.tree.map(jnp.copy, params)
    p2 = jax.tree.map(jnp.copy, params)
    st_x, loss_x = make_step_fn(cfg)(TrainState(p1, adam.init(p1)), batch)
    st_p, loss_p = make_pallas_step_fn(cfg, tile_batch=8, interpret=True)(
        TrainState(p2, adam.init(p2)), batch
    )
    assert float(loss_p) == pytest.approx(float(loss_x), rel=1e-5)
    for a, b in zip(jax.tree.leaves(st_x.params), jax.tree.leaves(st_p.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )
