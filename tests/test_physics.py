"""Physics layer tests: tau laws, tau_total, omega, smoothing."""

import jax.numpy as jnp
import numpy as np
import pytest

from qfa_tpu.physics import (
    COEFF,
    LYA_WAVELENGTH,
    omega_func,
    smooth_curve,
    sliding_mean,
    tau,
    tau_becker,
    tau_fg,
    tau_hi,
    tau_kamble,
    tau_mock,
    tau_total,
)
from qfa_tpu.data.grid import make_grid


def test_tau_laws_spot_values():
    # Spot values computed from the published formulas.
    z = jnp.array([2.0, 3.0])
    np.testing.assert_allclose(
        np.asarray(tau_becker(z)),
        0.751 * ((1 + np.array([2.0, 3.0])) / 4.5) ** 2.90 - 0.132,
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(tau_fg(z)), 0.0018 * (1 + np.array([2.0, 3.0])) ** 3.92, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(tau_kamble(z)),
        5.54e-3 * (1 + np.array([2.0, 3.0])) ** 3.182,
        rtol=1e-6,
    )
    assert float(tau_mock(jnp.array(2.25))) == pytest.approx(
        0.2231435513142097 * (3.25 / 3.25) ** 3.2
    )


def test_lyman_coefficients_normalized():
    assert COEFF[0] == pytest.approx(1.0)
    assert np.all(np.diff(COEFF) < 0)  # strictly decreasing with series order
    # Ly-beta coefficient: lambda_b f_b / (lambda_a f_a)
    expected = 1025.7222 * 7.9140e-02 / (1215.6701 * 4.1620e-01)
    assert COEFF[1] == pytest.approx(expected)


def test_tau_series_scaling():
    z = jnp.array([2.5])
    t1 = np.asarray(tau(z, which="becker", series=1))
    t2 = np.asarray(tau(z, which="becker", series=2))
    assert t2[0] == pytest.approx(t1[0] * float(COEFF[1]), rel=1e-6)


def test_tau_total_default_grid_is_lya_only():
    """For the default grid (lam_min=1030 > Ly-beta) tau_total reduces to the
    single Ly-alpha term — the consistency property the reference's
    train/predict split relies on (SURVEY.md section 3.2)."""
    grid = make_grid()
    zqso = jnp.array([2.3, 3.1])
    total = np.asarray(tau_total(grid.wav, zqso))
    assert total.shape == (2, grid.nb)
    zabs = grid.zabs(np.array([2.3, 3.1]))
    lya_only = np.asarray(tau(jnp.asarray(zabs), which="becker", series=1))
    np.testing.assert_allclose(total, lya_only, rtol=1e-5, atol=1e-6)


def test_tau_total_wide_grid_includes_higher_series():
    grid = make_grid(lam_min=950.0)
    zqso = jnp.array([2.5])
    total = np.asarray(tau_total(grid.wav, zqso))
    # pixels below Ly-beta must exceed the pure Ly-alpha contribution
    zabs = grid.zabs(np.array([2.5]))
    lya_only = np.asarray(tau(jnp.asarray(zabs), which="becker", series=1))
    below_lyb = np.asarray(grid.blue) < 1025.7222
    assert np.all(total[0, below_lyb] > lya_only[0, below_lyb])
    above_lyb = ~below_lyb
    np.testing.assert_allclose(total[0, above_lyb], lya_only[0, above_lyb], rtol=1e-5, atol=1e-6)


def test_omega_func_matches_formula():
    z = jnp.array([2.0, 2.5, 3.0])
    tau0, beta, c0 = 0.14, 1.3, 0.23
    got = np.asarray(omega_func(z, tau0, beta, c0))
    root = 1.0 - c0 - np.exp(-tau0 * (1 + np.array([2.0, 2.5, 3.0])) ** beta)
    np.testing.assert_allclose(got, root * root, rtol=1e-6)
    assert np.asarray(tau_hi(jnp.array(2.0), 0.1, 2.0)) == pytest.approx(0.9)


def test_smooth_curve_matches_reference_semantics():
    rng = np.random.default_rng(1)
    s = rng.normal(size=200)
    w = 16
    # Direct re-statement of the reference algorithm
    padded = np.r_[s[w - 1 : 0 : -1], s, s[-2 : -w - 1 : -1]]
    kern = np.ones(w) / w
    expect = np.convolve(kern, padded, mode="valid")[int(w / 2 - 1) : -int(w / 2)]
    got = smooth_curve(s, w)
    assert got.shape == s.shape
    np.testing.assert_allclose(got, expect, rtol=1e-12)


def test_sliding_mean_matches_avg_pool_semantics():
    """Edge-truncated mean == torch avg_pool1d(count_include_pad=False)."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=50).astype(np.float32)
    for window in (15, 31):
        got = np.asarray(sliding_mean(jnp.asarray(x), window))
        k = window // 2
        expect = np.array(
            [x[max(0, i - k) : i + k + 1].mean() for i in range(len(x))],
            dtype=np.float32,
        )
        np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_sliding_mean_2d_axis():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(40, 8)).astype(np.float32)
    got = np.asarray(sliding_mean(jnp.asarray(x), 31, axis=0))
    k = 15
    expect = np.stack(
        [x[max(0, i - k) : i + k + 1].mean(axis=0) for i in range(40)]
    ).astype(np.float32)
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_sliding_mean_rejects_even_window():
    with pytest.raises(ValueError):
        sliding_mean(jnp.ones(10), 4)


def test_resolve_tau_forms():
    """resolve_tau recovers law names from every reference-style spec
    (/root/reference/QFA/model.py:26-33, main.py:87) and passes opaque
    callables through."""
    from functools import partial

    from qfa_tpu.physics.tau import resolve_tau, tau, tau_fg

    assert resolve_tau("kamble") == "kamble"
    assert resolve_tau(partial(tau, which="fg")) == "fg"
    assert resolve_tau(partial(tau, which="mock", series=1)) == "mock"
    assert resolve_tau(tau_fg) == "fg"
    f = lambda z: z  # noqa: E731
    assert resolve_tau(f) is f
    with pytest.raises(NotImplementedError):
        resolve_tau("nope")
    with pytest.raises(NotImplementedError):
        resolve_tau(partial(tau, which="nope"))
    with pytest.raises(TypeError):
        resolve_tau(123)


def test_resolve_tau_never_substitutes_user_callables():
    """A partial over a USER function — even one carrying which= — must
    keep the user's physics, and a non-default series cannot be collapsed
    to a Ly-alpha law name (code-review r3 finding)."""
    from functools import partial

    from qfa_tpu.physics.tau import resolve_tau, tau

    def my_tau(z, which="becker"):
        return 0.0 * z + 42.0

    spec = partial(my_tau, which="becker")
    resolved = resolve_tau(spec)
    assert callable(resolved) and resolved is spec  # NOT "becker"
    assert float(resolved(1.0)) == 42.0

    # the dispatcher with a pinned non-alpha series stays a callable too
    spec2 = partial(tau, which="fg", series=2)
    assert callable(resolve_tau(spec2))
    # positional args also block name recovery
    import jax.numpy as jnp

    spec3 = partial(tau, jnp.asarray(2.0))
    assert callable(resolve_tau(spec3))
