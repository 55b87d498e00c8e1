"""Masked low-rank Gaussian core vs dense O(N^3) linear algebra."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qfa_tpu.linalg import (
    LOG_2PI,
    batched_capacitance,
    dense_masked_nll,
    factorize,
    gram_matrix,
    nll,
    solve_posterior,
)


def random_system(rng, b=4, npix=96, nh=5):
    f = rng.normal(size=(npix, nh)).astype(np.float32) * 0.3
    delta = rng.normal(size=(b, npix)).astype(np.float32)
    amp = rng.uniform(0.5, 1.0, size=(b, npix)).astype(np.float32)
    d = rng.uniform(0.2, 2.0, size=(b, npix)).astype(np.float32)
    mask = (rng.uniform(size=(b, npix)) > 0.25).astype(np.float32)
    return f, delta, amp, d, mask


def to_factors(f, delta, amp, d, mask):
    dinv = mask / d
    log_d = mask * np.log(d)
    return factorize(
        jnp.asarray(f),
        jnp.asarray(delta * mask),
        jnp.asarray(amp),
        jnp.asarray(dinv),
        jnp.asarray(log_d),
        jnp.asarray(mask),
    )


def test_gram_matrix_symmetry():
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.normal(size=(32, 4)).astype(np.float32))
    g = gram_matrix(f)
    assert g.shape == (32, 16)
    gt = np.asarray(g).reshape(32, 4, 4)
    np.testing.assert_allclose(gt, np.swapaxes(gt, 1, 2), rtol=1e-6)


def test_batched_capacitance_equals_direct():
    rng = np.random.default_rng(1)
    f, delta, amp, d, mask = random_system(rng)
    w = amp * amp * mask / d
    k = np.asarray(batched_capacitance(gram_matrix(jnp.asarray(f)), jnp.asarray(w)))
    for b in range(len(w)):
        direct = np.eye(f.shape[1]) + (f.T * w[b]) @ f
        np.testing.assert_allclose(k[b], direct, rtol=1e-4, atol=1e-5)


def dense_nll_f64(f, delta, amp, d, mask):
    """Row-deleted dense NLL in float64 numpy (ground truth for tests)."""
    keep = mask > 0
    ftil = (amp[:, None].astype(np.float64) * f.astype(np.float64))[keep]
    sigma = ftil @ ftil.T + np.diag(d.astype(np.float64)[keep])
    sub = delta.astype(np.float64)[keep]
    return 0.5 * (
        sub @ np.linalg.solve(sigma, sub)
        + keep.sum() * LOG_2PI
        + np.linalg.slogdet(sigma)[1]
    )


def test_masked_nll_equals_dense_submatrix():
    """The load-bearing property: fixed-shape masked arithmetic reproduces the
    row-deleted dense computation for every masking pattern."""
    rng = np.random.default_rng(2)
    f, delta, amp, d, mask = random_system(rng)
    factors = to_factors(f, delta, amp, d, mask)
    got = np.asarray(nll(factors))
    for b in range(delta.shape[0]):
        dense = dense_nll_f64(f, delta[b], amp[b], d[b], mask[b])
        # float32 evaluation vs float64 ground truth
        assert got[b] == pytest.approx(dense, rel=2e-4, abs=5e-3)


def test_fully_masked_row_contributes_zero():
    rng = np.random.default_rng(3)
    f, delta, amp, d, mask = random_system(rng, b=2)
    mask[1] = 0.0
    factors = to_factors(f, delta, amp, d, mask)
    out = np.asarray(nll(factors))
    assert out[1] == pytest.approx(0.0, abs=1e-6)
    assert np.isfinite(out).all()


def test_posterior_matches_dense():
    rng = np.random.default_rng(4)
    f, delta, amp, d, mask = random_system(rng, b=3)
    factors = to_factors(f, delta, amp, d, mask)
    hmean, hcov = solve_posterior(factors)
    for b in range(3):
        keep = mask[b] > 0
        ftil = (amp[b][:, None] * f)[keep]
        dinv = 1.0 / d[b][keep]
        kmat = np.eye(f.shape[1]) + (ftil.T * dinv) @ ftil
        cov = np.linalg.inv(kmat)
        mean = cov @ (ftil.T @ (dinv * delta[b][keep]))
        np.testing.assert_allclose(np.asarray(hcov[b]), cov, rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(hmean[b]), mean, rtol=1e-3, atol=1e-4)


def test_unmasked_equals_full_dense():
    rng = np.random.default_rng(5)
    f, delta, amp, d, mask = random_system(rng, b=2)
    mask[:] = 1.0
    factors = to_factors(f, delta, amp, d, mask)
    got = np.asarray(nll(factors))
    for b in range(2):
        ftil = amp[b][:, None] * f
        sigma = ftil @ ftil.T + np.diag(d[b])
        n = len(d[b])
        expect = 0.5 * (
            delta[b] @ np.linalg.solve(sigma, delta[b])
            + n * LOG_2PI
            + np.linalg.slogdet(sigma)[1]
        )
        assert got[b] == pytest.approx(expect, rel=2e-4, abs=5e-3)


def test_factorize_is_jit_and_vmap_safe():
    rng = np.random.default_rng(6)
    f, delta, amp, d, mask = random_system(rng)
    dinv = mask / d
    log_d = mask * np.log(d)

    @jax.jit
    def run(fm, dl, am, di, ld, mk):
        return nll(factorize(fm, dl, am, di, ld, mk))

    out = run(
        jnp.asarray(f),
        jnp.asarray(delta * mask),
        jnp.asarray(amp),
        jnp.asarray(dinv),
        jnp.asarray(log_d),
        jnp.asarray(mask),
    )
    assert out.shape == (delta.shape[0],)
    assert np.isfinite(np.asarray(out)).all()


def test_gradients_flow_through_factorization():
    rng = np.random.default_rng(7)
    f, delta, amp, d, mask = random_system(rng, b=2, npix=48, nh=3)
    dinv = (mask / d).astype(np.float32)
    log_d = (mask * np.log(d)).astype(np.float32)

    def loss(fm):
        return jnp.sum(
            nll(
                factorize(
                    fm,
                    jnp.asarray(delta * mask),
                    jnp.asarray(amp),
                    jnp.asarray(dinv),
                    jnp.asarray(log_d),
                    jnp.asarray(mask),
                )
            )
        )

    g = jax.grad(loss)(jnp.asarray(f))
    assert np.isfinite(np.asarray(g)).all()

    # Cross-algorithm gradient check: autodiff through the dense row-deleted
    # path must agree with autodiff through the low-rank masked path.
    def dense_loss(fm):
        total = 0.0
        for b in range(delta.shape[0]):
            total = total + dense_masked_nll(
                fm,
                jnp.asarray(delta[b]),
                jnp.asarray(amp[b]),
                jnp.asarray(d[b]),
                jnp.asarray(mask[b] > 0),
            )
        return total

    g_dense = jax.grad(dense_loss)(jnp.asarray(f))
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_dense), rtol=5e-3, atol=5e-4
    )
