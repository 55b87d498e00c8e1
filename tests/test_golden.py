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
def test_golden_uncertainty_matches_reference_formula(golden):
    """``continuum_std`` equals the reference's shipped uncertainty code.

    The stored golden ``our_uncertainty`` array CANNOT be reproduced by the
    reference's own prediction path: an independent float64 numpy
    reimplementation of ``/root/reference/QFA/model.py:160-180``
    (masked/absorption-scaled F, ``omega_func`` z-evolution, full-F
    projection ``sqrt(diag(F hcov F^T))``) matches our ``continuum_std`` to
    ~1e-6 relative but differs from the stored artifact by a NON-CONSTANT
    factor (measured ratio 7-440x, mean ~100) — the artifact predates the
    shipped code. So the uncertainty contract is pinned against the
    reference's *code*, and the stored array's divergence is itself pinned
    so a change in either side is caught (SURVEY.md section 6 triage).
    """
    spec, params, mu, flux, error, zabs, mask = golden
    from qfa_tpu.physics.tau import tau, tau_hi

    nb = np.asarray(zabs).shape[-1]
    mask_np = np.asarray(mask[0])
    mz = mask_np[:nb]
    nr_m = int(mask_np[nb:].sum())
    mzabs = np.asarray(zabs[0])[mz]
    F = np.asarray(params.F, np.float64)
    Psi = np.asarray(params.Psi, np.float64)
    omega = np.asarray(params.omega, np.float64)
    tau0, beta, c0 = (
        float(params.tau0), float(params.beta), float(params.c0)
    )
    # reference model.py:165 — A = [exp(-tau(zabs)), ones(red)]
    t_lya = np.asarray(tau(jnp.asarray(mzabs)), np.float64)
    amp = np.concatenate([np.exp(-t_lya), np.ones(nr_m)])
    f_masked = amp[:, None] * F[mask_np]
    # model.py:169-172 — diag = A Psi A + omega*omega_func(z) + error^2
    thi = np.asarray(
        tau_hi(jnp.asarray(mzabs), jnp.asarray(tau0), jnp.asarray(beta)),
        np.float64,
    )
    zdep = (1.0 - c0 - np.exp(-thi)) ** 2
    om = np.concatenate([omega[mz] * zdep, np.zeros(nr_m)])
    diag = (
        amp * Psi[mask_np] * amp
        + om
        + np.asarray(error[0])[mask_np].astype(np.float64) ** 2
    )
    # model.py:178-180 — hcov = inv(I + F^T Sigma_e F); unc on FULL F
    hcov = np.linalg.inv(
        np.eye(F.shape[1]) + f_masked.T @ ((1.0 / diag)[:, None] * f_masked)
    )
    unc = np.sqrt(np.einsum("ij,jk,ik->i", F, hcov, F))

    res = predict(params, mu, flux, error, zabs, mask)
    ours = np.asarray(res.continuum_std[0], np.float64)
    np.testing.assert_allclose(ours, unc, rtol=5e-5)

    # the stored artifact is NOT the shipped code's output (triage pin)
    ratio = unc / np.asarray(spec["our_uncertainty"], np.float64)
    assert ratio.min() > 5.0 and ratio.std() > 10.0


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
