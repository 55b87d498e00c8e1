"""Model-layer tests: params, constraints, NLL assembly, gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qfa_tpu.data.batch import SpectraBatch, pad_batch
from qfa_tpu.models import (
    ModelOptions,
    QFAParams,
    absorption,
    batch_nll,
    clip_params,
    load_npz,
    loss_and_grads,
    mean_nll,
    normalize_grads,
    random_init,
    save_npz,
    smooth_params,
)
from qfa_tpu.models.qfa import noise_diagonal
from qfa_tpu.linalg import dense_masked_nll
from qfa_tpu.physics import omega_func, tau


NPIX, NB, NH = 64, 24, 4


def make_batch(rng, b=6, npix=NPIX, nb=NB, mask_frac=0.2):
    delta = rng.normal(size=(b, npix)).astype(np.float32)
    error = rng.uniform(0.1, 0.5, size=(b, npix)).astype(np.float32)
    zqso = rng.uniform(2.0, 3.5, size=(b,))
    lam = np.linspace(1040.0, 1205.0, nb)
    zabs = ((1 + zqso)[:, None] * lam / 1215.67 - 1).astype(np.float32)
    mask = (rng.uniform(size=(b, npix)) > mask_frac).astype(np.float32)
    return SpectraBatch(
        delta=jnp.asarray(delta),
        error=jnp.asarray(error),
        zabs=jnp.asarray(zabs),
        mask=jnp.asarray(mask),
        weight=jnp.ones((b,), jnp.float32),
    )


@pytest.fixture(scope="module")
def params():
    return random_init(jax.random.key(0), NPIX, NB, NH)


def test_random_init_matches_reference_strategy(params):
    assert params.F.shape == (NPIX, NH)
    f = np.asarray(params.F)
    assert f.min() >= -0.5 and f.max() <= 0.5
    assert np.all(np.asarray(params.Psi) == 1.0)
    assert np.all(np.asarray(params.omega) == 1.0)
    assert float(params.tau0) == pytest.approx(0.02)
    assert float(params.c0) == pytest.approx(0.3)
    assert float(params.beta) == pytest.approx(2.0)


def test_clip_params_box():
    p = QFAParams(
        F=jnp.zeros((4, 2)),
        Psi=jnp.array([0.0, 5.0, 1.0, -1.0]),
        omega=jnp.array([3.0, 1e-9]),
        tau0=jnp.asarray(2.0),
        c0=jnp.asarray(-9.0),
        beta=jnp.asarray(9.0),
    )
    c = clip_params(p)
    np.testing.assert_allclose(np.asarray(c.Psi), [1e-3, 2.0, 1.0, 1e-3])
    np.testing.assert_allclose(np.asarray(c.omega), [2.0, 1e-3])
    assert float(c.tau0) == 1.0
    assert float(c.c0) == -5.0
    assert float(c.beta) == 5.0


def test_smooth_params_preserves_shapes_and_mean(params):
    s = smooth_params(params)
    assert s.F.shape == params.F.shape
    assert s.Psi.shape == params.Psi.shape
    assert s.omega.shape == params.omega.shape
    # smoothing a constant leaves it unchanged
    np.testing.assert_allclose(np.asarray(s.Psi), 1.0, rtol=1e-6)


def test_absorption_red_side_is_unity():
    zabs = jnp.full((2, 5), 2.5, jnp.float32)
    a = absorption(zabs, nr=3)
    assert a.shape == (2, 8)
    np.testing.assert_allclose(np.asarray(a[:, 5:]), 1.0)
    expected = np.exp(-np.asarray(tau(jnp.full((5,), 2.5), series=1)))
    np.testing.assert_allclose(np.asarray(a[0, :5]), expected, rtol=1e-6)


def test_batch_nll_matches_dense_per_spectrum(params):
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    out = np.asarray(batch_nll(params, batch))
    amp = absorption(batch.zabs, NPIX - NB)
    zdep = omega_func(batch.zabs, params.tau0, params.beta, params.c0)
    for b in range(batch.batch_size):
        a = np.asarray(amp[b])
        omega_full = np.concatenate(
            [np.asarray(params.omega) * np.asarray(zdep[b]), np.zeros(NPIX - NB)]
        )
        d = a * a * np.asarray(params.Psi) + omega_full + np.asarray(batch.error[b]) ** 2
        dense = float(
            dense_masked_nll(
                params.F,
                batch.delta[b],
                jnp.asarray(a, jnp.float32),
                jnp.asarray(d, jnp.float32),
                batch.mask[b] > 0,
            )
        )
        assert out[b] == pytest.approx(dense, rel=3e-5, abs=3e-4)


def test_padded_rows_contribute_zero(params):
    rng = np.random.default_rng(1)
    batch = make_batch(rng, b=3)
    padded = pad_batch(batch, 8)
    out = np.asarray(batch_nll(params, padded))
    np.testing.assert_allclose(out[3:], 0.0, atol=1e-6)
    loss_small = float(mean_nll(params, batch))
    loss_padded = float(mean_nll(params, padded))
    assert loss_padded == pytest.approx(loss_small, rel=1e-6)


def test_loss_and_grads_finite_and_padding_invariant(params):
    rng = np.random.default_rng(2)
    batch = make_batch(rng, b=5)
    loss, grads = loss_and_grads(params, batch)
    assert np.isfinite(float(loss))
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
    loss_p, grads_p = loss_and_grads(params, pad_batch(batch, 8))
    assert float(loss_p) == pytest.approx(float(loss), rel=1e-5)
    for a, b in zip(jax.tree.leaves(grads), jax.tree.leaves(grads_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_normalize_grads_counts(params):
    """Per-element averaging divides by the number of observing spectra."""
    rng = np.random.default_rng(3)
    batch = make_batch(rng, b=4, mask_frac=0.5)
    _, grads_sum = loss_and_grads(params, batch, reference_norm=False)
    # reference_norm=False divides by batch size; reconstruct the sum
    grads_sum = jax.tree.map(lambda g: g * 4.0, grads_sum)
    normed = normalize_grads(grads_sum, batch)
    counts = np.asarray(jnp.sum(batch.mask, axis=0))
    psi_sum = np.asarray(grads_sum.Psi)
    psi_norm = np.asarray(normed.Psi)
    observed = counts > 0
    np.testing.assert_allclose(
        psi_norm[observed], psi_sum[observed] / counts[observed], rtol=1e-5
    )
    np.testing.assert_allclose(psi_norm[~observed], 0.0)


def test_gradient_matches_finite_difference(params):
    """Autodiff through the full masked likelihood vs central differences on
    the scalar physics parameters (where the reference's hand gradients were
    wrong — SURVEY.md section 3 bug 3)."""
    rng = np.random.default_rng(4)
    batch = make_batch(rng, b=3)

    def loss_with(**kw):
        p = params._replace(**{k: jnp.asarray(v, jnp.float32) for k, v in kw.items()})
        return float(mean_nll(p, batch))

    _, grads = loss_and_grads(params, batch, reference_norm=False)
    eps = 1e-3
    for name in ("tau0", "c0", "beta"):
        v0 = float(getattr(params, name))
        num = (loss_with(**{name: v0 + eps}) - loss_with(**{name: v0 - eps})) / (2 * eps)
        got = float(getattr(grads, name))
        assert got == pytest.approx(num, rel=5e-2, abs=1e-4), name


def test_npz_roundtrip(tmp_path, params):
    mu = np.linspace(0.5, 1.5, NPIX).astype(np.float32)
    path = str(tmp_path / "ckpt.npz")
    save_npz(path, params, mu)
    loaded, mu2 = load_npz(path)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(mu2), mu, rtol=1e-6)
