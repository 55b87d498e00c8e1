"""Fused Pallas inference kernel vs the XLA predict path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import qfa_tpu
from qfa_tpu.data.synthetic import generate
from qfa_tpu.models import predict, random_init
from qfa_tpu.ops.infer_kernel import fused_predict


@pytest.fixture(scope="module")
def problem():
    grid = qfa_tpu.make_grid(1030.0, 1090.0, 1e-3)
    nh = 4
    params = random_init(jax.random.key(0), grid.npix, grid.nb, nh)
    params = params._replace(
        Psi=jnp.full((grid.npix,), 0.4),
        omega=jnp.full((grid.nb,), 0.7),
        tau0=jnp.asarray(0.12), c0=jnp.asarray(0.21), beta=jnp.asarray(1.7),
    )
    mu = jnp.linspace(0.9, 1.3, grid.npix).astype(jnp.float32)
    syn = generate(jax.random.key(1), params, mu, grid, 32, mask_frac=0.15)
    return grid, params, mu, syn


def test_fused_predict_matches_xla_predict(problem):
    grid, params, mu, syn = problem
    ref = predict(params, mu, syn.flux, syn.error * syn.mask, syn.zabs,
                  syn.mask)
    out = fused_predict(
        params, mu, syn.flux * syn.mask, syn.error * syn.mask, syn.zabs,
        syn.mask, tile_batch=8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out.ll), np.asarray(ref.ll),
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(out.hmean), np.asarray(ref.hmean),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.hcov), np.asarray(ref.hcov),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out.continuum),
                               np.asarray(ref.continuum), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.continuum_std),
                               np.asarray(ref.continuum_std), rtol=1e-3,
                               atol=1e-5)


def test_fused_predict_derived_mask(problem):
    """mask=None derives the mask from error > 0 and matches."""
    grid, params, mu, syn = problem
    flux = syn.flux * syn.mask
    error = syn.error * syn.mask
    out_m = fused_predict(params, mu, flux, error, syn.zabs, syn.mask,
                          tile_batch=8, interpret=True)
    out_d = fused_predict(params, mu, flux, error, syn.zabs, None,
                          tile_batch=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out_d.ll), np.asarray(out_m.ll),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out_d.continuum),
                               np.asarray(out_m.continuum), rtol=1e-6)


def test_fused_predict_derive_zabs(problem):
    """The zq-column mode (in-kernel absorber redshifts) matches the
    zabs-plane run to float32 rounding."""
    from qfa_tpu.ops import loglam_row, zq_column

    grid, params, mu, syn = problem
    flux = syn.flux * syn.mask
    error = syn.error * syn.mask
    out_p = fused_predict(params, mu, flux, error, syn.zabs, syn.mask,
                          tile_batch=8, interpret=True)
    out_c = fused_predict(params, mu, flux, error, zq_column(syn.zqso),
                          syn.mask, tile_batch=8, interpret=True,
                          loglam=loglam_row(grid.wav), derive_zabs=True)
    np.testing.assert_allclose(np.asarray(out_c.ll), np.asarray(out_p.ll),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_c.hmean),
                               np.asarray(out_p.hmean), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_c.continuum),
                               np.asarray(out_p.continuum), rtol=1e-4,
                               atol=1e-5)


@pytest.mark.skipif(
    not __import__("os").path.isdir("/root/reference/data"),
    reason="reference data artifacts not present",
)
def test_fused_predict_golden_file():
    """The kernel reproduces the reference's stored golden outputs."""
    from qfa_tpu.models import load_npz

    grid = qfa_tpu.make_grid()
    params, mu = load_npz(
        "/root/reference/data/model_parameters.npz", compat_c0_bug=True
    )
    s = np.load("/root/reference/data/spec-4321-55504-0114.npz")
    mask = np.asarray(s["mask"], bool)
    flux = np.where(mask, s["flux"], 0.0).astype(np.float32)
    error = np.where(mask, s["error"], 0.0).astype(np.float32)
    zabs = grid.zabs(np.array([float(s["z"])])).astype(np.float32)
    out = fused_predict(
        params, mu,
        jnp.asarray(flux)[None], jnp.asarray(error)[None],
        jnp.asarray(zabs), jnp.asarray(mask, jnp.float32)[None],
        tile_batch=1, interpret=True,
    )
    assert float(out.ll[0]) == pytest.approx(float(s["ll"]), abs=5e-3)
    np.testing.assert_allclose(np.asarray(out.hmean[0]), s["h"], atol=5e-5)
    np.testing.assert_allclose(np.asarray(out.continuum[0]), s["our"],
                               atol=5e-5)

    # the zq-column mode hits the same golden values
    from qfa_tpu.ops import loglam_row, zq_column

    out_c = fused_predict(
        params, mu,
        jnp.asarray(flux)[None], jnp.asarray(error)[None],
        zq_column(jnp.asarray([float(s["z"])])),
        jnp.asarray(mask, jnp.float32)[None],
        tile_batch=1, interpret=True,
        loglam=loglam_row(grid.wav), derive_zabs=True,
    )
    assert float(out_c.ll[0]) == pytest.approx(float(s["ll"]), abs=5e-3)
    np.testing.assert_allclose(np.asarray(out_c.continuum[0]), s["our"],
                               atol=5e-5)


def test_predict_dataset_fused_matches_host_path(problem):
    """The chunked fused-kernel driver equals predict_dataset (host path),
    including tail-chunk padding."""
    from qfa_tpu.data.loader import SpectraDataset
    from qfa_tpu.infer import predict_dataset, predict_dataset_fused

    grid, params, mu, syn = problem
    m = np.asarray(syn.mask) > 0
    ds = SpectraDataset(
        flux=np.where(m, np.asarray(syn.flux), 0.0).astype(np.float32),
        error=np.where(m, np.asarray(syn.error), 0.0).astype(np.float32),
        mask=m,
        zqso=np.asarray(syn.zqso, np.float32),
        paths=(),
    )
    a = predict_dataset(params, mu, ds, grid, batch_size=8)
    # chunk=16 with 32 spectra and tile 8 -> 2 chunks; then chunk=24 forces
    # a padded tail chunk
    for chunk in (16, 24):
        b = predict_dataset_fused(params, mu, ds, grid, chunk=chunk,
                                  tile_batch=8, interpret=True)
        np.testing.assert_allclose(np.asarray(b.ll), np.asarray(a.ll),
                                   rtol=2e-5)
        np.testing.assert_allclose(np.asarray(b.continuum),
                                   np.asarray(a.continuum), rtol=1e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(b.hcov), np.asarray(a.hcov),
                                   rtol=1e-4, atol=1e-7)


def test_predict_dataset_fused_unsanitized_mask(problem):
    """When masked pixels carry error > 0 (mask not derivable from the
    error plane), the chunked driver ships the mask plane and still
    matches the host path."""
    from qfa_tpu.data.loader import SpectraDataset
    from qfa_tpu.infer import predict_dataset, predict_dataset_fused

    grid, params, mu, syn = problem
    m = np.asarray(syn.mask) > 0
    ds = SpectraDataset(
        flux=np.where(m, np.asarray(syn.flux), 0.0).astype(np.float32),
        error=np.asarray(syn.error, np.float32),  # masked pixels keep error
        mask=m,
        zqso=np.asarray(syn.zqso, np.float32),
        paths=(),
    )
    assert not bool(np.all((ds.error > 0.0) == ds.mask))
    a = predict_dataset(params, mu, ds, grid, batch_size=8)
    b = predict_dataset_fused(params, mu, ds, grid, chunk=16, tile_batch=8,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(b.ll), np.asarray(a.ll), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(b.continuum),
                               np.asarray(a.continuum), rtol=1e-4, atol=1e-5)


def test_fused_predict_fully_masked_rows(problem):
    """Fully-masked rows are inert: ll = 0, n_obs = 0, posterior = prior."""
    grid, params, mu, syn = problem
    flux = np.array(syn.flux * syn.mask)
    error = np.array(syn.error * syn.mask)
    mask = np.array(syn.mask)
    flux[3] = 0.0
    error[3] = 0.0
    mask[3] = 0.0
    out = fused_predict(
        params, mu, jnp.asarray(flux), jnp.asarray(error), syn.zabs,
        jnp.asarray(mask), tile_batch=8, interpret=True,
    )
    assert float(out.ll[3]) == 0.0
    assert float(out.n_obs[3]) == 0.0
    # prior posterior: hmean = 0, hcov = I
    np.testing.assert_allclose(np.asarray(out.hmean[3]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.hcov[3]),
                               np.eye(params.F.shape[1]), atol=1e-5)
    # continuum falls back to mu
    np.testing.assert_allclose(np.asarray(out.continuum[3]),
                               np.asarray(mu), atol=1e-5)
    # other rows unaffected
    ref = fused_predict(
        params, mu, syn.flux * syn.mask, syn.error * syn.mask, syn.zabs,
        syn.mask, tile_batch=8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out.ll[:3]), np.asarray(ref.ll[:3]),
                               rtol=1e-6)


def test_fused_predict_stats_only(problem):
    """OOD-sweep mode: same ll/posterior, no continuum planes."""
    grid, params, mu, syn = problem
    flux = syn.flux * syn.mask
    error = syn.error * syn.mask
    full = fused_predict(params, mu, flux, error, syn.zabs, syn.mask,
                         tile_batch=8, interpret=True)
    lean = fused_predict(params, mu, flux, error, syn.zabs, syn.mask,
                         tile_batch=8, interpret=True, stats_only=True)
    assert lean.continuum is None and lean.continuum_std is None
    np.testing.assert_allclose(np.asarray(lean.ll), np.asarray(full.ll),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(lean.hmean),
                               np.asarray(full.hmean), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(lean.hcov), np.asarray(full.hcov),
                               rtol=1e-6)


def test_fused_predict_desi_width_auto_tile():
    """DESI-scale fused inference (VERDICT r2 #2): the npix-aware tile
    heuristic picks a VMEM-safe 128-row tile at Npix=9243 (a fixed 256
    fails to compile at that width on hardware; sub-128 tiles cannot
    lower at all — the lane-major stats output needs a 128-multiple
    minor block, so 128 is the floor for arbitrarily wide grids too),
    and the chunked driver matches the XLA predict path on the real
    DESI grid."""
    from qfa_tpu.data.loader import SpectraDataset
    from qfa_tpu.infer import predict_dataset, predict_dataset_fused
    from qfa_tpu.ops.infer_kernel import default_tile_batch

    grid = qfa_tpu.make_grid(1113.5772, 1600.0, 1.7029661e-05)
    assert grid.npix == 9243
    assert default_tile_batch(grid.npix) == 128
    assert default_tile_batch(1913) == 256
    assert default_tile_batch(16000) == 128  # the lowering floor

    nh = 4
    params = random_init(jax.random.key(0), grid.npix, grid.nb, nh)
    mu = jnp.linspace(0.9, 1.3, grid.npix).astype(jnp.float32)
    n = 80  # not a tile multiple: exercises the padded tail at auto tile
    syn = generate(jax.random.key(1), params, mu, grid, n, mask_frac=0.1)
    m = np.asarray(syn.mask) > 0
    ds = SpectraDataset(
        flux=np.where(m, np.asarray(syn.flux), 0.0).astype(np.float32),
        error=np.where(m, np.asarray(syn.error), 0.0).astype(np.float32),
        mask=m,
        zqso=np.asarray(syn.zqso, np.float32),
        paths=(),
    )
    a = predict_dataset(params, mu, ds, grid, batch_size=40)
    b = predict_dataset_fused(params, mu, ds, grid, interpret=True)
    np.testing.assert_allclose(np.asarray(b.ll), np.asarray(a.ll), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(b.continuum),
                               np.asarray(a.continuum), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b.hmean), np.asarray(a.hmean),
                               rtol=1e-4, atol=1e-6)


def test_fused_predict_bf16_planes(problem):
    """bfloat16 flux/error streaming tracks the f32 run within the data
    quantization level (survey-scale OOD sweeps)."""
    grid, params, mu, syn = problem
    flux = syn.flux * syn.mask
    error = syn.error * syn.mask
    a = fused_predict(params, mu, flux, error, syn.zabs, None,
                      tile_batch=8, interpret=True)
    b = fused_predict(params, mu, flux.astype(jnp.bfloat16),
                      error.astype(jnp.bfloat16), syn.zabs, None,
                      tile_batch=8, interpret=True)
    np.testing.assert_allclose(np.asarray(b.n_obs), np.asarray(a.n_obs))
    np.testing.assert_allclose(np.asarray(b.ll), np.asarray(a.ll), rtol=2e-2)
    np.testing.assert_allclose(np.asarray(b.continuum),
                               np.asarray(a.continuum), rtol=5e-2, atol=2e-2)


def test_fused_predict_bf16_out(problem):
    """out_dtype=bfloat16 halves the continuum/std planes' HBM footprint:
    the planes come back bfloat16 within bf16 quantization of the f32
    run, and every per-spectrum stat (ll, posterior, counts) stays f32
    and BITWISE equal (the cast happens only at the plane store)."""
    grid, params, mu, syn = problem
    flux = syn.flux * syn.mask
    error = syn.error * syn.mask
    a = fused_predict(params, mu, flux, error, syn.zabs, None,
                      tile_batch=8, interpret=True)
    b = fused_predict(params, mu, flux, error, syn.zabs, None,
                      tile_batch=8, interpret=True, out_dtype=jnp.bfloat16)
    assert b.continuum.dtype == jnp.bfloat16
    assert b.continuum_std.dtype == jnp.bfloat16
    for name in ("ll", "hmean", "hcov", "n_obs"):
        got = getattr(b, name)
        assert got.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(got),
                                      np.asarray(getattr(a, name)),
                                      err_msg=name)
    np.testing.assert_allclose(
        np.asarray(b.continuum, np.float32), np.asarray(a.continuum),
        rtol=1e-2, atol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(b.continuum_std, np.float32),
        np.asarray(a.continuum_std), rtol=1e-2, atol=1e-2,
    )


@pytest.mark.parametrize("nh", [1, 10])
def test_fused_predict_stats_layout_nh_edges(nh):
    """Stats packing at the latent-dim edges: nh=1 (single 8-row stats
    block) and nh=10 (112 stats rows — the largest the ll+n_obs+hmean+
    hcov layout admits under the 128-lane cap)."""
    grid = qfa_tpu.make_grid(1030.0, 1060.0, 1e-3)
    params = random_init(jax.random.key(3), grid.npix, grid.nb, nh)
    mu = jnp.linspace(0.9, 1.3, grid.npix).astype(jnp.float32)
    syn = generate(jax.random.key(4), params, mu, grid, 16, mask_frac=0.1)
    ref = predict(params, mu, syn.flux, syn.error * syn.mask, syn.zabs,
                  syn.mask)
    out = fused_predict(params, mu, syn.flux * syn.mask,
                        syn.error * syn.mask, syn.zabs, syn.mask,
                        tile_batch=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out.ll), np.asarray(ref.ll),
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(out.hmean), np.asarray(ref.hmean),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(out.hcov), np.asarray(ref.hcov),
                               rtol=2e-4, atol=1e-7)
    assert out.hcov.shape == (16, nh, nh)


def test_fused_predict_rejects_oversized_nh():
    """nh=11 needs 2+11+121 = 134 > 128 stats entries — refused loudly."""
    grid = qfa_tpu.make_grid(1030.0, 1060.0, 1e-3)
    params = random_init(jax.random.key(3), grid.npix, grid.nb, 11)
    mu = jnp.ones((grid.npix,), jnp.float32)
    z = jnp.zeros((8, grid.npix), jnp.float32)
    with pytest.raises(ValueError, match="nh"):
        fused_predict(params, mu, z, z, z, None, tile_batch=8,
                      interpret=True)


def test_fused_predict_permutation_equivariant(problem):
    """Each spectrum's outputs are independent of its tile neighbors:
    permuting the batch permutes every output identically (lane-dot math
    is per-lane, so this holds exactly in interpret mode)."""
    grid, params, mu, syn = problem
    flux = syn.flux * syn.mask
    error = syn.error * syn.mask
    perm = np.random.default_rng(5).permutation(flux.shape[0])
    a = fused_predict(params, mu, flux, error, syn.zabs, syn.mask,
                      tile_batch=8, interpret=True)
    b = fused_predict(params, mu, flux[perm], error[perm], syn.zabs[perm],
                      syn.mask[perm], tile_batch=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(b.ll),
                                  np.asarray(a.ll)[perm])
    np.testing.assert_array_equal(np.asarray(b.hmean),
                                  np.asarray(a.hmean)[perm])
    np.testing.assert_array_equal(np.asarray(b.continuum),
                                  np.asarray(a.continuum)[perm])
