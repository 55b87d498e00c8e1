"""Cross-implementation tests: execute the actual PyTorch reference.

Imports the reference package from /root/reference (read-only) and compares
its per-spectrum likelihood, prediction, and the gradient components its
hand-derived math gets right (Psi, omega — verified exact in SURVEY.md
section 3) against this framework on identical random inputs. The
gradient components the reference gets wrong (F, tau0, c0, beta) are
deliberately NOT compared (ours are exact by autodiff).
"""

import os
import sys

import numpy as np
import pytest

from conftest import REFERENCE_DIR, requires_reference

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_modules():
    """Import the reference package (its utils loads a CWD-relative CSV)."""
    if not os.path.isdir(f"{REFERENCE_DIR}/QFA"):
        pytest.skip("reference code not present")
    # the reference hard-depends on yacs, which this image lacks; it is only
    # used for config-type annotations in the modules under test — stub it
    if "yacs" not in sys.modules:
        import types

        yacs = types.ModuleType("yacs")
        yacs_config = types.ModuleType("yacs.config")

        class _CfgNode(dict):
            pass

        yacs_config.CfgNode = _CfgNode
        yacs.config = yacs_config
        sys.modules["yacs"] = yacs
        sys.modules["yacs.config"] = yacs_config
    old_cwd = os.getcwd()
    os.chdir(f"{REFERENCE_DIR}/QFA")
    sys.path.insert(0, REFERENCE_DIR)
    try:
        from QFA.model import QFA as RefQFA  # noqa
        from QFA import utils as ref_utils  # noqa
    finally:
        os.chdir(old_cwd)
    return RefQFA, ref_utils


@pytest.fixture(scope="module")
def problem(ref_modules):
    import jax
    import jax.numpy as jnp

    import qfa_tpu
    from qfa_tpu.models import random_init

    rng = np.random.default_rng(0)
    grid = qfa_tpu.make_grid(1030.0, 1300.0, 1e-3)
    nh = 5
    params = random_init(jax.random.key(1), grid.npix, grid.nb, nh)
    params = params._replace(
        Psi=jnp.asarray(rng.uniform(0.2, 1.5, grid.npix), jnp.float32),
        omega=jnp.asarray(rng.uniform(0.2, 1.5, grid.nb), jnp.float32),
        tau0=jnp.asarray(0.15), c0=jnp.asarray(0.24), beta=jnp.asarray(1.33),
    )
    z = 2.7
    zabs = grid.zabs(np.array([z]))[0].astype(np.float32)
    delta = rng.normal(0, 0.5, grid.npix).astype(np.float32)
    error = rng.uniform(0.05, 0.3, grid.npix).astype(np.float32)
    mask = rng.uniform(size=grid.npix) > 0.2
    return grid, params, zabs, delta, error, mask


def make_ref_model(RefQFA, grid, params, nh):
    model = RefQFA(grid.nb, grid.nr, nh, torch.device("cpu"))
    model.F = torch.tensor(np.asarray(params.F))
    model.Psi = torch.tensor(np.asarray(params.Psi))
    model.omega = torch.tensor(np.asarray(params.omega))
    model.tau0 = torch.tensor(float(params.tau0))
    model.c0 = torch.tensor(float(params.c0))
    model.beta = torch.tensor(float(params.beta))
    return model


@requires_reference
def test_single_spectrum_nll_matches_reference_exactly(problem, ref_modules):
    RefQFA, _ = ref_modules
    grid, params, zabs, delta, error, mask = problem
    model = make_ref_model(RefQFA, grid, params, params.nh)
    ll_ref, grads_ref = model.loglikelihood_and_gradient_for_single_spectra(
        torch.tensor(delta), torch.tensor(error),
        torch.tensor(zabs), torch.tensor(mask),
    )

    import jax.numpy as jnp
    from qfa_tpu.data.batch import SpectraBatch
    from qfa_tpu.models.qfa import summed_stats

    m = mask.astype(np.float32)
    batch = SpectraBatch(
        delta=jnp.asarray(delta * m)[None],
        error=jnp.asarray(error * m)[None],
        zabs=jnp.asarray(zabs)[None],
        mask=jnp.asarray(m)[None],
        weight=jnp.ones((1,), jnp.float32),
    )
    total, _n, grads, _c = summed_stats(params, batch)
    ll_ours = float(total)
    ll_torch = float(ll_ref.squeeze())
    assert ll_ours == pytest.approx(ll_torch, rel=2e-5), (ll_ours, ll_torch)

    # Psi / omega gradients are the components the reference derives
    # correctly (SURVEY.md section 3) — they must agree across frameworks.
    np.testing.assert_allclose(
        np.asarray(grads.Psi), grads_ref["Psi"].numpy(), rtol=2e-3, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(grads.omega), grads_ref["omega"].numpy(), rtol=2e-3, atol=2e-5
    )


@requires_reference
def test_prediction_matches_reference_exactly(problem, ref_modules):
    RefQFA, _ = ref_modules
    grid, params, zabs, delta, error, mask = problem
    rng = np.random.default_rng(3)
    flux = (1.0 + 0.3 * rng.normal(size=grid.npix)).astype(np.float32)
    mu_vec = np.linspace(0.8, 1.4, grid.npix).astype(np.float32)

    model = make_ref_model(RefQFA, grid, params, params.nh)
    model.mu = torch.tensor(mu_vec)
    ll_r, hmean_r, hcov_r, cont_r, unc_r = model.prediction_for_single_spectra(
        torch.tensor(flux), torch.tensor(error),
        torch.tensor(zabs), torch.tensor(mask),
    )

    import jax.numpy as jnp
    from qfa_tpu.models import predict

    m_f = mask.astype(np.float32)
    res = predict(
        params, jnp.asarray(mu_vec),
        jnp.asarray(flux * m_f)[None], jnp.asarray(error * m_f)[None],
        jnp.asarray(zabs)[None], jnp.asarray(m_f)[None],
    )
    assert float(res.ll[0]) == pytest.approx(float(ll_r.squeeze()), rel=2e-5)
    np.testing.assert_allclose(
        np.asarray(res.hmean[0]), hmean_r.numpy()[:, 0], rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(res.hcov[0]), hcov_r.numpy(), rtol=1e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(res.continuum[0]), cont_r.numpy(), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(res.continuum_std[0]), unc_r.numpy(), rtol=1e-3, atol=1e-4
    )


@requires_reference
def test_tau_laws_match_reference_implementation(ref_modules):
    _, ref_utils = ref_modules
    z = np.linspace(2.0, 4.0, 11)
    import jax.numpy as jnp
    from qfa_tpu.physics import tau

    for which in ("becker", "fg", "kamble", "mock"):
        for series in (1, 2, 5):
            ours = np.asarray(tau(jnp.asarray(z), which=which, series=series))
            theirs = ref_utils.tau(
                torch.tensor(z), which=which, series=series
            ).numpy()
            np.testing.assert_allclose(ours, theirs, rtol=1e-6, err_msg=f"{which}/{series}")


@requires_reference
def test_omega_func_matches_reference(ref_modules):
    _, ref_utils = ref_modules
    import jax.numpy as jnp
    from qfa_tpu.physics import omega_func

    z = np.linspace(2.0, 3.5, 9)
    ours = np.asarray(omega_func(jnp.asarray(z), 0.15, 1.33, 0.24))
    theirs = ref_utils.omega_func(
        torch.tensor(z), torch.tensor(0.15), torch.tensor(1.33),
        torch.tensor(0.24),
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


@pytest.fixture(scope="module")
def ref_dataloader_cls(ref_modules):
    """The reference Dataloader class (imported after the yacs stub)."""
    from QFA.dataloader import Dataloader as RefDataloader

    return RefDataloader


@requires_reference
def test_data_layer_matches_reference_exactly(ref_dataloader_cls, tmp_path):
    """mu estimate and first-batch residuals vs the executed reference
    Dataloader on shared tiny npz fixtures (/root/reference/QFA/dataloader.py
    :60-138), including pixels masked only through error (the denominator
    quirk, SURVEY.md section 3 quirk 7)."""
    import jax.numpy as jnp

    import qfa_tpu
    from qfa_tpu.config import load_config
    from qfa_tpu.data.loader import (
        SpectraDataset,
        estimate_mu,
        make_residuals,
    )

    rng = np.random.default_rng(7)
    lam_min, lam_max, dlog = 1045.0, 1350.0, 1e-3
    grid = qfa_tpu.make_grid(lam_min, lam_max, dlog)
    n = 12
    ddir = tmp_path / "spectra"
    ddir.mkdir()
    rows = []
    for i in range(n):
        flux = rng.uniform(0.5, 2.0, grid.npix)
        error = rng.uniform(0.05, 0.2, grid.npix)
        sel = rng.choice(grid.npix, 12, replace=False)
        flux[sel[:4]] = -999.0
        error[sel[:4]] = -999.0
        error[sel[4:8]] = -999.0  # error-only masked: the denominator quirk
        flux[sel[8:]] = -999.0    # flux-only masked
        flux[sel[11]] = 0.0       # genuinely zero observed flux
        np.savez(ddir / f"s{i:02d}.npz", flux=flux, error=error,
                 z=2.2 + 0.09 * i)
        rows.append(dict(file=f"s{i:02d}.npz", snr=10.0, z=2.2 + 0.09 * i,
                         num_mask=0))
    import pandas as pd

    pd.DataFrame(rows).to_csv(tmp_path / "catalog.csv", index=False)

    cfg = load_config(opts=[
        "TYPE", "train",
        "DATA.CATALOG", str(tmp_path / "catalog.csv"),
        "DATA.DATA_DIR", str(ddir),
        "DATA.OUTPUT_DIR", str(tmp_path / "ref_out"),
        "DATA.DATA_NUM", str(n),
        "DATA.BATCH_SIZE", "5",
        "DATA.NUM_MASK", "4",
        "DATA.SNR_MIN", "2.0",
        "DATA.LAMMIN", str(lam_min),
        "DATA.LAMMAX", str(lam_max),
        "DATA.LOGLAM_DELTA", str(dlog),
        "DATA.NPROCS", "2",
    ])
    np.random.seed(0)  # the reference samples the catalog via the global rng
    ref_dl = ref_dataloader_cls(cfg)
    assert ref_dl.data_size == n

    # ours, on the same files IN THE REFERENCE'S SELECTION ORDER so batches
    # line up row for row
    paths = [str(p) for p in ref_dl.pathlist]
    ds = SpectraDataset.from_paths(paths)
    mu_ours = estimate_mu(ds, grid, tau_which="becker", window=16,
                          compat_denominator=True)
    np.testing.assert_allclose(
        mu_ours, np.asarray(ref_dl.mu, np.float32), rtol=1e-5, atol=1e-6
    )

    # first-batch residuals: the reference's delta carries sentinel garbage
    # at masked pixels (masked later by row deletion); compare masked values
    ref_dl.cur = 0  # no rewind: keep selection order
    d_ref, e_ref, z_ref, m_ref = ref_dl.next_batch()
    m_np = m_ref.numpy()
    res = make_residuals(ds, grid, mu_ours, tau_which="becker")
    np.testing.assert_allclose(
        np.asarray(res.delta[:5]), d_ref.numpy() * m_np, rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(res.error[:5]) , e_ref.numpy() * m_np, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(res.zabs[:5]), z_ref.numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(res.mask[:5]) > 0, m_np
    )
