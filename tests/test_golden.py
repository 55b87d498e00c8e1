"""Golden-file parity against the reference's bundled artifacts.

The reference repo ships a pretrained SDSS model and one spectrum with stored
outputs (``ll``, ``h``, continuum ``our``, plus red-side-only variants) —
the de-facto integration test for the whole likelihood/posterior pipeline.
Those outputs were generated under the reference's c0-load bug
(``/root/reference/QFA/model.py:295`` loads ``beta`` into ``c0``), which
``load_npz(compat_c0_bug=True)`` reproduces.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import qfa_tpu
from qfa_tpu.models import ModelOptions, load_npz, predict

from conftest import REFERENCE_DIR, requires_reference

MODEL_NPZ = f"{REFERENCE_DIR}/data/model_parameters.npz"
DESI_NPZ = f"{REFERENCE_DIR}/data/model_parameters_desi.npz"
SPEC_NPZ = f"{REFERENCE_DIR}/data/spec-4321-55504-0114.npz"


@pytest.fixture(scope="module")
def grid():
    return qfa_tpu.make_grid()


@pytest.fixture(scope="module")
def golden(grid):
    spec = np.load(SPEC_NPZ)
    params, mu = load_npz(MODEL_NPZ, compat_c0_bug=True)
    flux = jnp.asarray(spec["flux"], jnp.float32)[None]
    error = jnp.asarray(spec["error"], jnp.float32)[None]
    mask = jnp.asarray(spec["mask"])[None]
    zabs = jnp.asarray(grid.zabs(np.array([float(spec["z"])])), jnp.float32)
    return spec, params, mu, flux, error, zabs, mask


@requires_reference
def test_grid_matches_sdss_shapes(grid):
    assert (grid.npix, grid.nb, grid.nr) == (1913, 720, 1193)


@requires_reference
def test_pretrained_checkpoint_shapes():
    params, mu = load_npz(MODEL_NPZ)
    assert params.F.shape == (1913, 8)
    assert params.Psi.shape == (1913,)
    assert params.omega.shape == (720,)
    assert mu.shape == (1913,)
    # correct (non-compat) load keeps c0 distinct from beta
    assert float(params.c0) == pytest.approx(0.23864652, rel=1e-5)
    assert float(params.beta) == pytest.approx(1.3326559, rel=1e-5)


@requires_reference
def test_compat_flag_reproduces_reference_load_bug():
    params, _ = load_npz(MODEL_NPZ, compat_c0_bug=True)
    assert float(params.c0) == float(params.beta)


@requires_reference
def test_desi_checkpoint_loads():
    params, mu = load_npz(DESI_NPZ)
    assert params.F.shape == (9243, 8)
    assert params.omega.shape == (2238,)
    assert mu.shape == (9243,)


@requires_reference
def test_golden_full_spectrum(golden):
    spec, params, mu, flux, error, zabs, mask = golden
    res = predict(params, mu, flux, error, zabs, mask)
    ll = float(res.ll[0])
    # stored: -510.2292; the reference's own re-run reproduces -510.2296
    assert ll == pytest.approx(float(spec["ll"]), abs=5e-3)
    np.testing.assert_allclose(np.asarray(res.hmean[0]), spec["h"], atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(res.continuum[0]), spec["our"], atol=5e-5
    )


@requires_reference
def test_golden_red_side_only(golden):
    spec, params, mu, flux, error, zabs, mask = golden
    mask_red = np.asarray(mask[0]).copy()
    mask_red[: zabs.shape[-1]] = False
    res = predict(params, mu, flux, error, zabs, jnp.asarray(mask_red)[None])
    assert float(res.ll[0]) == pytest.approx(float(spec["ll_red"]), abs=5e-3)
    np.testing.assert_allclose(np.asarray(res.hmean[0]), spec["h_red"], atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(res.continuum[0]), spec["our_red"], atol=5e-5
    )


@requires_reference
def test_correct_c0_changes_likelihood(golden):
    """With the load bug fixed the NLL moves to the documented value
    (-714.2186, SURVEY.md section 6) — guards that the compat flag is not a
    no-op and the forest-noise term actually uses c0."""
    spec, _, mu, flux, error, zabs, mask = golden
    params_fixed, mu2 = load_npz(MODEL_NPZ, compat_c0_bug=False)
    res = predict(params_fixed, mu2, flux, error, zabs, mask)
    assert float(res.ll[0]) == pytest.approx(-714.2186, abs=5e-2)


@requires_reference
def test_batched_prediction_consistent(golden):
    """Batching spectra together must not change per-spectrum results."""
    spec, params, mu, flux, error, zabs, mask = golden
    flux3 = jnp.concatenate([flux, flux * 1.05, flux], axis=0)
    error3 = jnp.concatenate([error, error, error * 2.0], axis=0)
    zabs3 = jnp.concatenate([zabs] * 3, axis=0)
    mask3 = jnp.concatenate([mask] * 3, axis=0)
    res3 = predict(params, mu, flux3, error3, zabs3, mask3)
    res1 = predict(params, mu, flux, error, zabs, mask)
    assert float(res3.ll[0]) == pytest.approx(float(res1.ll[0]), abs=1e-3)
    np.testing.assert_allclose(
        np.asarray(res3.continuum[0]), np.asarray(res1.continuum[0]), atol=1e-5
    )
    assert float(res3.ll[1]) != pytest.approx(float(res1.ll[0]), abs=1e-2)


@requires_reference
def test_predict_resident_matches_predict(golden):
    """The scanned resident-data inference path must equal direct predict."""
    from qfa_tpu.infer import predict_resident

    spec, params, mu, flux, error, zabs, mask = golden
    flux4 = jnp.concatenate([flux, flux * 1.1, flux * 0.9, flux], axis=0)
    error4 = jnp.concatenate([error] * 4, axis=0)
    zabs4 = jnp.concatenate([zabs] * 4, axis=0)
    mask4 = jnp.concatenate([mask] * 4, axis=0)
    res_r = predict_resident(
        params, mu, flux4, error4, zabs4, mask4.astype(jnp.float32),
        batch_size=2,
    )
    res_d = predict(params, mu, flux4, error4, zabs4, mask4)
    np.testing.assert_allclose(
        np.asarray(res_r.ll), np.asarray(res_d.ll), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(res_r.continuum), np.asarray(res_d.continuum), atol=1e-4
    )
    assert float(res_r.ll[0]) == pytest.approx(float(spec["ll"]), abs=5e-3)
