"""Unrolled small-Cholesky kernels vs jnp.linalg ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qfa_tpu.linalg import smallchol


def spd_batch(rng, b=16, n=8):
    a = rng.normal(size=(b, n, n)).astype(np.float32) * 0.3
    return np.eye(n, dtype=np.float32) + a @ np.swapaxes(a, 1, 2)


def test_cholesky_matches_lapack():
    rng = np.random.default_rng(0)
    k = spd_batch(rng)
    got = np.asarray(smallchol.cholesky_small(jnp.asarray(k)))
    expect = np.linalg.cholesky(k)
    np.testing.assert_allclose(got, expect, rtol=2e-5, atol=1e-5)
    # strictly upper triangle is exactly zero
    assert (np.triu(got, 1) == 0).all()


@pytest.mark.parametrize("n", [1, 2, 3, 8, 12])
def test_cholesky_various_sizes(n):
    rng = np.random.default_rng(n)
    k = spd_batch(rng, b=4, n=n)
    got = np.asarray(smallchol.cholesky_small(jnp.asarray(k)))
    np.testing.assert_allclose(got, np.linalg.cholesky(k), rtol=5e-5, atol=1e-5)


def test_solves_match():
    rng = np.random.default_rng(1)
    k = spd_batch(rng)
    b = rng.normal(size=(16, 8)).astype(np.float32)
    chol = smallchol.cholesky_small(jnp.asarray(k))
    x = np.asarray(smallchol.chol_solve_small(chol, jnp.asarray(b)))
    expect = np.linalg.solve(k, b[..., None])[..., 0]
    np.testing.assert_allclose(x, expect, rtol=2e-4, atol=2e-5)


def test_logdet_matches():
    rng = np.random.default_rng(2)
    k = spd_batch(rng)
    chol = smallchol.cholesky_small(jnp.asarray(k))
    got = np.asarray(smallchol.logdet_from_chol(chol))
    expect = np.linalg.slogdet(k)[1]
    np.testing.assert_allclose(got, expect, rtol=2e-5, atol=1e-5)


def test_inverse_matches():
    rng = np.random.default_rng(3)
    k = spd_batch(rng, b=5)
    chol = smallchol.cholesky_small(jnp.asarray(k))
    inv = np.asarray(smallchol.inverse_from_chol(chol))
    np.testing.assert_allclose(inv, np.linalg.inv(k), rtol=5e-4, atol=5e-5)


def test_large_dim_falls_back():
    rng = np.random.default_rng(4)
    k = spd_batch(rng, b=2, n=smallchol.MAX_UNROLL_DIM + 4)
    got = np.asarray(smallchol.cholesky_small(jnp.asarray(k)))
    np.testing.assert_allclose(got, np.linalg.cholesky(k), rtol=1e-4, atol=1e-5)


def test_autodiff_through_unrolled_chol():
    rng = np.random.default_rng(5)
    k = spd_batch(rng, b=3)

    def f_unrolled(k):
        return jnp.sum(smallchol.logdet_from_chol(smallchol.cholesky_small(k)))

    def f_lapack(k):
        return jnp.sum(2 * jnp.log(jnp.diagonal(
            jnp.linalg.cholesky(k), axis1=-2, axis2=-1)).sum(-1))

    g1 = jax.grad(f_unrolled)(jnp.asarray(k))
    g2 = jax.grad(f_lapack)(jnp.asarray(k))
    # grad of logdet is K^-T; compare the symmetrized gradients (the two
    # implementations distribute the symmetric cotangent differently)
    s1 = np.asarray(g1) + np.swapaxes(np.asarray(g1), 1, 2)
    s2 = np.asarray(g2) + np.swapaxes(np.asarray(g2), 1, 2)
    np.testing.assert_allclose(s1, s2, rtol=2e-4, atol=2e-5)
