"""Inference pipeline: dataset batching, OOD selection, sharded inference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import qfa_tpu
from qfa_tpu.data.loader import SpectraDataset
from qfa_tpu.data.synthetic import generate
from qfa_tpu.infer import ood_scores, predict_dataset, predict_resident
from qfa_tpu.infer.predict import select_ood
from qfa_tpu.models import predict, random_init
from qfa_tpu.parallel import make_mesh
from jax.sharding import NamedSharding, PartitionSpec as P


@pytest.fixture(scope="module")
def problem():
    grid = qfa_tpu.make_grid(1030.0, 1120.0, 1e-3)
    params = random_init(jax.random.key(0), grid.npix, grid.nb, 4)
    mu = jnp.full((grid.npix,), 1.2, jnp.float32)
    syn = generate(jax.random.key(1), params, mu, grid, 40, mask_frac=0.1)
    return grid, params, mu, syn


def test_predict_dataset_pads_tail(problem):
    grid, params, mu, syn = problem
    ds = syn.to_dataset()
    # batch_size does not divide N -> tail batch is padded internally
    res = predict_dataset(params, mu, ds, grid, batch_size=16)
    assert res.ll.shape == (40,)
    assert res.continuum.shape == (40, grid.npix)
    direct = predict(params, mu, syn.flux, syn.error, syn.zabs, syn.mask)
    np.testing.assert_allclose(res.ll, np.asarray(direct.ll), atol=2e-3)
    np.testing.assert_allclose(
        res.continuum, np.asarray(direct.continuum), atol=1e-4
    )


def test_ood_selection_flags_corrupted_spectra(problem):
    grid, params, mu, syn = problem
    # corrupt three spectra with strong excess variance
    flux = np.asarray(syn.flux).copy()
    bad = [3, 17, 29]
    rng = np.random.default_rng(0)
    flux[bad] += rng.normal(size=(3, grid.npix)) * 2.0
    res = predict(
        params, mu, jnp.asarray(flux), syn.error, syn.zabs, syn.mask
    )
    n_obs = np.asarray(jnp.sum(syn.mask, axis=1))
    top = select_ood(res, top_k=3, n_obs=n_obs)
    assert set(top.tolist()) == set(bad)
    scores = ood_scores(res, n_obs)
    assert scores.shape == (40,)
    # quantile selection contains the top-k set
    q = select_ood(res, quantile=0.9, n_obs=n_obs)
    assert set(bad).issubset(set(q.tolist()))


def test_sharded_inference_on_mesh(problem):
    """predict_resident under a data-sharded mesh: XLA partitions the scan
    over the batch axis with replicated params."""
    grid, params, mu, syn = problem
    mesh = make_mesh(8)
    shard = NamedSharding(mesh, P("data"))

    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P("data", *[None] * (x.ndim - 1))))

    flux, error, zabs, mask = map(put, (syn.flux, syn.error, syn.zabs, syn.mask))
    res = predict_resident(
        params, mu, flux, error, zabs, mask, batch_size=8
    )
    direct = predict(params, mu, syn.flux, syn.error, syn.zabs, syn.mask)
    np.testing.assert_allclose(
        np.asarray(res.ll), np.asarray(direct.ll), atol=2e-3
    )


def test_score_resident_matches_predict(problem):
    from qfa_tpu.infer import score_resident

    grid, params, mu, syn = problem
    ll = score_resident(
        params, mu, syn.flux, syn.error, syn.zabs, syn.mask, batch_size=8
    )
    direct = predict(params, mu, syn.flux, syn.error, syn.zabs, syn.mask)
    np.testing.assert_allclose(
        np.asarray(ll), np.asarray(direct.ll), atol=2e-3
    )


def test_posterior_continuum_sampling(problem):
    """Sample mean converges to the posterior continuum; spread reflects
    hcov."""
    from qfa_tpu.infer import sample_posterior_continua

    grid, params, mu, syn = problem
    res = predict(params, mu, syn.flux[:4], syn.error[:4], syn.zabs[:4],
                  syn.mask[:4])
    samples = sample_posterior_continua(
        params, mu, res, jax.random.key(0), 4000
    )
    assert samples.shape == (4000, 4, grid.npix)
    mean = np.asarray(samples.mean(axis=0))
    np.testing.assert_allclose(
        mean, np.asarray(res.continuum), atol=0.02
    )
    std = np.asarray(samples.std(axis=0))
    np.testing.assert_allclose(
        std, np.asarray(res.continuum_std), rtol=0.2, atol=0.01
    )
