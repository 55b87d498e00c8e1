"""Data layer: npz reading, catalog selection, mu estimation, residuals,
batching."""

import numpy as np
import pandas as pd
import jax
import jax.numpy as jnp
import pytest

import qfa_tpu
from qfa_tpu.data.loader import (
    MISSING,
    SpectraDataset,
    batch_indices,
    estimate_mu,
    make_residuals,
    read_spectrum,
    select_from_catalog,
)
from qfa_tpu.physics import smooth_curve, tau_total


@pytest.fixture(scope="module")
def grid():
    return qfa_tpu.make_grid(1030.0, 1100.0, 1e-3)


def write_spec(path, npix, z, rng, n_missing=0):
    flux = rng.uniform(0.5, 2.0, npix)
    error = rng.uniform(0.05, 0.2, npix)
    if n_missing:
        sel = rng.choice(npix, n_missing, replace=False)
        flux[sel] = MISSING
        error[sel] = MISSING
    np.savez(path, flux=flux, error=error, z=z)
    return flux, error


def test_read_spectrum_sanitizes_sentinels(tmp_path, grid):
    rng = np.random.default_rng(0)
    p = tmp_path / "s.npz"
    write_spec(p, grid.npix, 2.5, rng, n_missing=7)
    flux, error, mask, z, flux_ok = read_spectrum(str(p))
    assert mask.sum() == grid.npix - 7
    assert z == 2.5
    # no sentinel leaks into the arrays
    assert (flux != MISSING).all() and (error != MISSING).all()
    assert (flux[~mask] == 0).all() and (error[~mask] == 0).all()
    np.testing.assert_array_equal(flux_ok, mask)  # both masked together here


def test_dataset_from_paths_parallel_read(tmp_path, grid):
    rng = np.random.default_rng(1)
    paths = []
    for i in range(12):
        p = tmp_path / f"s{i}.npz"
        write_spec(p, grid.npix, 2.0 + 0.1 * i, rng, n_missing=i)
        paths.append(str(p))
    ds = SpectraDataset.from_paths(paths, max_workers=4)
    assert ds.size == 12 and ds.npix == grid.npix
    np.testing.assert_allclose(ds.zqso, 2.0 + 0.1 * np.arange(12), rtol=1e-6)
    assert (~ds.mask).sum() == sum(range(12))


def test_catalog_selection_filters_and_samples(tmp_path):
    cat = pd.DataFrame(
        dict(
            file=[f"f{i}.npz" for i in range(20)],
            snr=np.linspace(1, 20, 20),
            z=np.linspace(1.5, 4.0, 20),
            num_mask=[0] * 10 + [5] * 10,
        )
    )
    cat_path = tmp_path / "cat.csv"
    cat.to_csv(cat_path, index=False)
    paths = select_from_catalog(
        str(cat_path), "/data", 5,
        snr_min=2, snr_max=100, z_min=2, z_max=3.5, num_mask=0, seed=0,
        output_dir=str(tmp_path), prefix="train",
    )
    assert len(paths) == 5
    assert all(p.startswith("/data/") for p in paths)
    assert (tmp_path / "train-catalog.csv").exists()
    # oversampling with replacement when the cut is too small
    many = select_from_catalog(
        str(cat_path), "/data", 50,
        snr_min=2, snr_max=100, z_min=2, z_max=3.5, num_mask=0, seed=0,
    )
    assert len(many) == 50


def test_mu_estimate_matches_direct_formula(tmp_path, grid):
    rng = np.random.default_rng(2)
    n = 16
    flux = rng.uniform(0.5, 2.0, (n, grid.npix)).astype(np.float32)
    mask = rng.uniform(size=(n, grid.npix)) > 0.1
    flux = np.where(mask, flux, 0.0).astype(np.float32)
    error = np.where(mask, 0.1, 0.0).astype(np.float32)
    z = rng.uniform(2.2, 3.0, n).astype(np.float32)
    ds = SpectraDataset(flux=flux, error=error, mask=mask, zqso=z, paths=())
    mu = estimate_mu(ds, grid, compat_denominator=False)

    taus = np.asarray(tau_total(jnp.asarray(grid.wav), jnp.asarray(z)))
    de = np.concatenate([np.exp(taus), np.ones((n, grid.nr))], axis=1)
    raw = (flux * de * mask).sum(0) / np.maximum(mask.sum(0), 1)
    np.testing.assert_allclose(mu, smooth_curve(raw, 16), rtol=1e-4, atol=1e-5)


def test_residuals_zero_on_masked_and_match_formula(grid):
    rng = np.random.default_rng(3)
    n = 8
    mask = rng.uniform(size=(n, grid.npix)) > 0.2
    flux = np.where(mask, rng.uniform(0.5, 2, (n, grid.npix)), 0).astype(np.float32)
    error = np.where(mask, 0.1, 0).astype(np.float32)
    z = rng.uniform(2.2, 3.0, n).astype(np.float32)
    ds = SpectraDataset(flux=flux, error=error, mask=mask, zqso=z, paths=())
    mu = np.linspace(0.8, 1.5, grid.npix).astype(np.float32)
    res = make_residuals(ds, grid, mu)
    assert res.delta.shape == (n, grid.npix)
    assert res.zabs.shape == (n, grid.nb)
    d = np.asarray(res.delta)
    assert (d[~mask] == 0).all()
    taus = np.asarray(tau_total(jnp.asarray(grid.wav), jnp.asarray(z)))
    absorb = np.concatenate([np.exp(-taus), np.ones((n, grid.nr))], 1)
    expect = (flux - mu * absorb) * mask
    np.testing.assert_allclose(d, expect.astype(np.float32), atol=2e-6)


def test_compute_taus_chunking_invariant(grid):
    """Chunked tau evaluation equals the single-shot result exactly."""
    from qfa_tpu.data.loader import compute_taus

    zqso = np.random.default_rng(3).uniform(2.0, 3.5, 37).astype(np.float32)
    whole = compute_taus(grid, zqso, chunk=64)
    for chunk in (1, 7, 36, 37):
        np.testing.assert_array_equal(
            compute_taus(grid, zqso, chunk=chunk), whole
        )


def test_read_predict_catalog_header_sniff(tmp_path, grid):
    """Headerless catalogs keep every row; a ported catalog WITH a header
    row (the reference's pd.read_csv default header would consume it,
    /root/reference/QFA/dataloader.py:88-91) is sniffed and dropped with
    a warning instead of gaining a bogus first 'file'."""
    import warnings

    from qfa_tpu.data.loader import read_predict_catalog

    rng = np.random.default_rng(4)
    names = [f"s{i}.npz" for i in range(3)]
    for name in names:
        write_spec(tmp_path / name, grid.npix, 2.4, rng)

    # headerless list: every row is a real file -> all kept, no warning
    plain = tmp_path / "plain.csv"
    plain.write_text("\n".join(names) + "\n")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        paths = read_predict_catalog(str(plain), str(tmp_path))
    assert [p.split("/")[-1] for p in paths] == names

    # headered list: first row names no file while later rows do ->
    # sniffed as a header and skipped, with a warning
    headered = tmp_path / "headered.csv"
    headered.write_text("file\n" + "\n".join(names) + "\n")
    with pytest.warns(UserWarning, match="header"):
        paths = read_predict_catalog(str(headered), str(tmp_path))
    assert [p.split("/")[-1] for p in paths] == names

    # a list whose rows are ALL missing is left untouched (no existing
    # later row to prove the first is a header)
    ghost = tmp_path / "ghost.csv"
    ghost.write_text("a.npz\nb.npz\n")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        paths = read_predict_catalog(str(ghost), str(tmp_path))
    assert len(paths) == 2


def test_batch_indices_cover_epoch():
    idx = batch_indices(jax.random.key(0), 100, 25)
    assert idx.shape == (4, 25)
    assert sorted(np.asarray(idx).ravel().tolist()) == list(range(100))
    idx2 = batch_indices(jax.random.key(1), 100, 25)
    assert not np.array_equal(np.asarray(idx), np.asarray(idx2))
    # remainder dropped
    idx3 = batch_indices(jax.random.key(0), 103, 25)
    assert idx3.shape == (4, 25)


def test_read_predict_catalog_missing_first_file_raises(tmp_path, grid):
    """A missing-but-path-like first row (e.g. a deleted .npz) must RAISE
    rather than be sniffed away as a header: silently dropping a real
    spectrum would misalign every downstream output against the user's
    catalog."""
    from qfa_tpu.data.loader import read_predict_catalog

    rng = np.random.default_rng(5)
    names = [f"t{i}.npz" for i in range(3)]
    for name in names[1:]:  # first file deliberately missing
        write_spec(tmp_path / name, grid.npix, 2.4, rng)
    cat = tmp_path / "cat.csv"
    cat.write_text("\n".join(names) + "\n")
    with pytest.raises(FileNotFoundError, match="looks like a spectrum"):
        read_predict_catalog(str(cat), str(tmp_path))

    # unlisted-extension variants must raise too: the sniff keys on
    # "looks like a filename" (any dot-suffix or path separator), not an
    # extension whitelist — a whitelist would silently drop a missing
    # spec-....fits.gz as a "header"
    for first in ("spec-0268-51633-0064.fits.gz", "sub/dir/t9"):
        cat.write_text(first + "\n" + "\n".join(names[1:]) + "\n")
        with pytest.raises(FileNotFoundError, match="looks like a spectrum"):
            read_predict_catalog(str(cat), str(tmp_path))

    # a bare header word with no dot/separator still sniffs away
    cat.write_text("spec_path\n" + "\n".join(names[1:]) + "\n")
    with pytest.warns(UserWarning, match="header"):
        got = read_predict_catalog(str(cat), str(tmp_path))
    assert got == [str(tmp_path / n) for n in names[1:]]
