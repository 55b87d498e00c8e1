"""Conditional mixture density network (the sbi/SNPE replacement)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qfa_tpu.models.mdn import (
    MDNConfig,
    fit_mdn,
    init_mdn,
    mdn_log_prob,
    mdn_sample,
    sample_mock_continua,
)


def make_data(rng, n=4000, d=3):
    """h depends linearly on (z, lum) with condition-dependent noise."""
    z = rng.uniform(2.0, 3.5, n)
    lum = rng.uniform(-1.0, 1.0, n)
    cond = np.stack([z, lum], 1).astype(np.float32)
    w = rng.normal(size=(2, d))
    mean = cond @ w
    h = mean + rng.normal(size=(n, d)) * 0.3
    return cond, h.astype(np.float32), w


def test_log_prob_shapes_and_finite():
    cfg = MDNConfig(cond_dim=2, out_dim=4, n_components=3, hidden=(16,))
    params = init_mdn(jax.random.key(0), cfg)
    cond = jnp.zeros((5, 2))
    h = jnp.zeros((5, 4))
    lp = mdn_log_prob(params, cond, h, cfg)
    assert lp.shape == (5,)
    assert np.isfinite(np.asarray(lp)).all()


def test_sample_shapes():
    cfg = MDNConfig(cond_dim=2, out_dim=4, n_components=3, hidden=(16,))
    params = init_mdn(jax.random.key(0), cfg)
    cond = jnp.zeros((5, 2))
    s = mdn_sample(params, jax.random.key(1), cond, 7, cfg)
    assert s.shape == (7, 5, 4)
    assert np.isfinite(np.asarray(s)).all()


def test_fit_recovers_conditional_structure():
    rng = np.random.default_rng(0)
    cond, h, w = make_data(rng, n=4000, d=3)
    cfg = MDNConfig(cond_dim=2, out_dim=3, n_components=4, hidden=(32, 32))
    params, info = fit_mdn(
        jax.random.key(0), cond, h, cfg, n_steps=1500, learning_rate=2e-3
    )
    assert info["losses"][-1] < info["losses"][0]

    # conditional mean at two probe conditions must track the true line
    for probe in (np.array([[2.2, -0.5]]), np.array([[3.2, 0.7]])):
        pc = (jnp.asarray(probe, jnp.float32) - info["cond_mean"]) / info["cond_std"]
        samples = np.asarray(
            mdn_sample(params, jax.random.key(2), pc, 4000, cfg)
        )[:, 0, :]
        true_mean = probe @ w
        err = np.abs(samples.mean(0) - true_mean[0])
        assert (err < 0.25).all(), (samples.mean(0), true_mean)
        # conditional std must be near the generating noise (0.3)
        assert (samples.std(0) < 0.7).all() and (samples.std(0) > 0.12).all()


def test_mock_continua_pipeline():
    rng = np.random.default_rng(1)
    cond, h, _ = make_data(rng, n=1000, d=3)
    cfg = MDNConfig(cond_dim=2, out_dim=3, n_components=2, hidden=(16,))
    params, info = fit_mdn(jax.random.key(0), cond, h, cfg, n_steps=200)
    npix = 40
    f = jnp.asarray(rng.normal(size=(npix, 3)), jnp.float32) * 0.1
    mu = jnp.ones((npix,), jnp.float32)
    continua = sample_mock_continua(
        params, jax.random.key(3), jnp.asarray(cond[:5]), f, mu, 6, cfg, info
    )
    assert continua.shape == (6, 5, npix)
    assert np.isfinite(np.asarray(continua)).all()
