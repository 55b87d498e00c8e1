"""Property-based tests (hypothesis): invariants of the masked likelihood."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st

import qfa_tpu
from qfa_tpu.data.batch import SpectraBatch
from qfa_tpu.models import batch_nll, random_init

GRID = qfa_tpu.make_grid(1030.0, 1100.0, 1e-3)
PARAMS = random_init(jax.random.key(0), GRID.npix, GRID.nb, 3)


def make_batch(rng, mask):
    npix = GRID.npix
    m = mask.astype(np.float32)
    return SpectraBatch(
        delta=jnp.asarray(rng.normal(0, 0.4, npix).astype(np.float32) * m)[None],
        error=jnp.asarray(rng.uniform(0.05, 0.3, npix).astype(np.float32) * m)[None],
        zabs=jnp.asarray(GRID.zabs(np.array([2.6]))[0].astype(np.float32))[None],
        mask=jnp.asarray(m)[None],
        weight=jnp.ones((1,), jnp.float32),
    )


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 10_000), frac=st.floats(0.0, 0.9))
def test_masked_pixel_values_are_irrelevant(seed, frac):
    """Changing data at masked pixels must not change the likelihood."""
    rng = np.random.default_rng(seed)
    mask = rng.uniform(size=GRID.npix) > frac
    if not mask.any():
        return
    b1 = make_batch(rng, mask)
    # corrupt the masked entries with garbage (then re-zero per contract:
    # the contract says masked entries are zeroed — test the stronger
    # property on error, whose masked entries feed D before masking)
    garbage = rng.normal(0, 100, GRID.npix).astype(np.float32)
    err2 = np.asarray(b1.error[0]) + np.where(mask, 0, garbage)
    b2 = b1._replace(error=jnp.asarray(err2)[None])
    ll1 = float(batch_nll(PARAMS, b1)[0])
    ll2 = float(batch_nll(PARAMS, b2)[0])
    assert ll1 == pytest.approx(ll2, rel=1e-6)


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_independent_pixels_add_closed_form_nll(seed):
    """Exact additivity check of the masked bookkeeping: pixels whose F
    rows are zero (and which sit on the red side, so no omega/absorption)
    are statistically independent of the rest — unmasking them must add
    EXACTLY sum_i 1/2 (log 2pi d_i + delta_i^2/d_i) with d_i = Psi_i +
    err_i^2. Pins the N log 2pi, sum log D and quad terms of the
    fixed-shape masked likelihood independently of the dense reference."""
    rng = np.random.default_rng(seed)
    # this test needs RED-side pixels (the module GRID is all blue)
    grid = qfa_tpu.make_grid(1100.0, 1400.0, 1e-3)
    base = random_init(jax.random.key(1), grid.npix, grid.nb, 3)
    extra = rng.choice(np.arange(grid.nb + 2, grid.npix), 7, replace=False)
    params = base._replace(F=base.F.at[jnp.asarray(extra), :].set(0.0))
    mask_small = rng.uniform(size=grid.npix) > 0.4
    mask_small[extra] = False
    mask_big = mask_small.copy()
    mask_big[extra] = True

    delta_full = rng.normal(0, 0.4, grid.npix).astype(np.float32)
    err_full = rng.uniform(0.05, 0.3, grid.npix).astype(np.float32)

    def with_mask(m):
        mf = m.astype(np.float32)
        return SpectraBatch(
            delta=jnp.asarray(delta_full * mf)[None],
            error=jnp.asarray(err_full * mf)[None],
            zabs=jnp.asarray(grid.zabs(np.array([2.6]))[0].astype(np.float32))[None],
            mask=jnp.asarray(mf)[None],
            weight=jnp.ones((1,), jnp.float32),
        )

    ll_small = float(batch_nll(params, with_mask(mask_small))[0])
    ll_big = float(batch_nll(params, with_mask(mask_big))[0])
    d = np.asarray(params.Psi)[extra] + err_full[extra] ** 2
    closed_form = 0.5 * np.sum(
        np.log(2.0 * np.pi * d) + delta_full[extra] ** 2 / d
    )
    np.testing.assert_allclose(ll_big - ll_small, closed_form, rtol=2e-4,
                               atol=2e-4)


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_permutation_invariance_of_batch(seed):
    """Reordering spectra permutes the per-spectrum NLLs identically."""
    rng = np.random.default_rng(seed)
    n = 6
    delta = rng.normal(0, 0.4, (n, GRID.npix)).astype(np.float32)
    err = rng.uniform(0.05, 0.3, (n, GRID.npix)).astype(np.float32)
    mask = (rng.uniform(size=(n, GRID.npix)) > 0.3).astype(np.float32)
    zabs = GRID.zabs(rng.uniform(2.2, 3.2, n)).astype(np.float32)
    batch = SpectraBatch(
        delta=jnp.asarray(delta * mask), error=jnp.asarray(err * mask),
        zabs=jnp.asarray(zabs), mask=jnp.asarray(mask),
        weight=jnp.ones((n,), jnp.float32),
    )
    perm = rng.permutation(n)
    permuted = jax.tree.map(lambda x: x[perm], batch)
    ll = np.asarray(batch_nll(PARAMS, batch))
    llp = np.asarray(batch_nll(PARAMS, permuted))
    np.testing.assert_allclose(llp, ll[perm], rtol=1e-6, atol=1e-5)
