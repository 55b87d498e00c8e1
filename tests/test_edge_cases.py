"""Edge cases: degenerate masks, extreme values, tiny batches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import qfa_tpu
from qfa_tpu.data.batch import SpectraBatch
from qfa_tpu.data.loader import SpectraDataset, estimate_mu
from qfa_tpu.models import batch_nll, loss_and_grads, predict, random_init


@pytest.fixture(scope="module")
def setup():
    grid = qfa_tpu.make_grid(1030.0, 1100.0, 1e-3)
    params = random_init(jax.random.key(0), grid.npix, grid.nb, 4)
    mu = jnp.full((grid.npix,), 1.2, jnp.float32)
    return grid, params, mu


def test_predict_fully_masked_spectrum(setup):
    """All pixels missing: posterior is the prior, continuum = mu, ll = 0."""
    grid, params, mu = setup
    flux = jnp.zeros((1, grid.npix))
    error = jnp.zeros((1, grid.npix))
    zabs = jnp.full((1, grid.nb), 2.5)
    mask = jnp.zeros((1, grid.npix))
    res = predict(params, mu, flux, error, zabs, mask)
    assert float(res.ll[0]) == pytest.approx(0.0, abs=1e-5)
    np.testing.assert_allclose(np.asarray(res.hmean[0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.hcov[0]), np.eye(4), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(res.continuum[0]), np.asarray(mu), atol=1e-5
    )


def test_single_observed_pixel(setup):
    grid, params, mu = setup
    mask = np.zeros((1, grid.npix), np.float32)
    mask[0, grid.npix // 2] = 1.0
    batch = SpectraBatch(
        delta=jnp.full((1, grid.npix), 0.3) * mask,
        error=jnp.full((1, grid.npix), 0.1) * mask,
        zabs=jnp.full((1, grid.nb), 2.5),
        mask=jnp.asarray(mask),
        weight=jnp.ones((1,)),
    )
    nll = batch_nll(params, batch)
    assert np.isfinite(float(nll[0]))
    loss, grads = loss_and_grads(params, batch)
    assert np.isfinite(float(loss))
    g = np.asarray(grads.F)
    observed = np.abs(g).sum(axis=1) > 0
    assert observed.sum() == 1  # only the observed pixel's loadings move


def test_extreme_error_values(setup):
    """Huge per-pixel noise: likelihood stays finite, pixel is soft-ignored."""
    grid, params, mu = setup
    err = np.full((1, grid.npix), 0.1, np.float32)
    err[0, 5] = 1e6
    batch = SpectraBatch(
        delta=jnp.full((1, grid.npix), 0.2),
        error=jnp.asarray(err),
        zabs=jnp.full((1, grid.nb), 2.5),
        mask=jnp.ones((1, grid.npix)),
        weight=jnp.ones((1,)),
    )
    nll = batch_nll(params, batch)
    assert np.isfinite(float(nll[0]))
    _loss, grads = loss_and_grads(params, batch)
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()


def test_batch_of_one(setup):
    grid, params, mu = setup
    batch = SpectraBatch(
        delta=jnp.full((1, grid.npix), 0.1),
        error=jnp.full((1, grid.npix), 0.1),
        zabs=jnp.full((1, grid.nb), 2.2),
        mask=jnp.ones((1, grid.npix)),
        weight=jnp.ones((1,)),
    )
    loss, grads = loss_and_grads(params, batch)
    assert np.isfinite(float(loss))


def test_mu_estimate_with_never_observed_pixel(setup):
    """A pixel observed by no spectrum must not produce NaN (the reference's
    0/0; SURVEY.md quirk 7)."""
    grid, _, _ = setup
    rng = np.random.default_rng(0)
    n = 8
    mask = np.ones((n, grid.npix), bool)
    mask[:, 3] = False  # pixel 3 never observed
    flux = np.where(mask, rng.uniform(0.5, 2, (n, grid.npix)), 0).astype(np.float32)
    error = np.where(mask, 0.1, 0).astype(np.float32)
    ds = SpectraDataset(
        flux=flux, error=error, mask=mask,
        zqso=rng.uniform(2.2, 3.0, n).astype(np.float32), paths=(),
    )
    mu = estimate_mu(ds, grid, compat_denominator=False)
    assert np.isfinite(mu).all()


def test_empty_catalog_selection_raises(tmp_path):
    import pandas as pd

    from qfa_tpu.data.loader import select_from_catalog

    cat = tmp_path / "cat.csv"
    pd.DataFrame(dict(file=["a.npz"], snr=[1.0], z=[5.0], num_mask=[9])).to_csv(
        cat, index=False
    )
    with pytest.raises(ValueError, match="selection is empty"):
        select_from_catalog(str(cat), "/data", 5, snr_min=2, snr_max=100,
                            z_min=2, z_max=3.5, num_mask=0)
