"""Native C++ npz batch reader vs the pure-Python reference reader."""

import numpy as np
import pytest

from qfa_tpu import native
from qfa_tpu.data.loader import read_spectra

NPIX = 97


@pytest.fixture(scope="module")
def survey(tmp_path_factory):
    root = tmp_path_factory.mktemp("native_survey")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(24):
        flux = rng.uniform(0.5, 2.0, NPIX)
        err = rng.uniform(0.05, 0.2, NPIX)
        sel = rng.choice(NPIX, 9, replace=False)
        flux[sel[:5]] = -999.0
        err[sel[:5]] = -999.0
        err[sel[5:7]] = -999.0  # error-only masked (flux_ok stays True)
        flux[sel[7:]] = -999.0  # flux-only masked
        p = str(root / f"s{i}.npz")
        save = np.savez if i % 2 == 0 else np.savez_compressed
        save(p, flux=flux, error=err, z=2.0 + 0.05 * i)
        paths.append(p)
    return paths


needs_native = pytest.mark.skipif(
    not native.native_available(), reason="no C++ toolchain"
)


@needs_native
def test_native_matches_python_reader(survey):
    f1, e1, m1, z1, ok1 = read_spectra(survey, engine="python")
    f2, e2, m2, z2, ok2 = native.read_spectra_native(survey, NPIX)
    np.testing.assert_allclose(f2, f1, atol=1e-6)
    np.testing.assert_allclose(e2, e1, atol=1e-6)
    np.testing.assert_array_equal(m2, m1)
    np.testing.assert_array_equal(ok2, ok1)
    np.testing.assert_allclose(z2, z1, atol=1e-5)
    # error-only-masked pixels: flux_ok is True where mask is False
    assert (ok2 & ~m2).sum() == 24 * 2


@needs_native
def test_auto_engine_uses_native(survey):
    f, e, m, z, ok = read_spectra(survey, engine="auto")
    f1, e1, m1, z1, ok1 = read_spectra(survey, engine="python")
    np.testing.assert_allclose(f, f1, atol=1e-6)
    np.testing.assert_array_equal(m, m1)
    np.testing.assert_array_equal(ok, ok1)


@needs_native
def test_native_handles_compressed_and_stored(survey):
    # survey alternates savez / savez_compressed; both must parse
    f, _, m, _, _ = native.read_spectra_native(survey, NPIX)
    assert np.isfinite(f).all()
    assert (~m).sum() == 24 * 9


@needs_native
def test_native_reports_missing_file(survey):
    with pytest.raises(IOError, match="cannot open"):
        native.read_spectra_native(survey[:2] + ["/nonexistent.npz"], NPIX)


@needs_native
def test_native_reports_bad_container(survey, tmp_path):
    bad = str(tmp_path / "bad.npz")
    with open(bad, "wb") as f:
        f.write(b"this is not a zip file at all, padding padding padding")
    with pytest.raises(IOError):
        native.read_spectra_native([bad], NPIX)


@needs_native
def test_native_rejects_wrong_grid_length(tmp_path):
    """Arrays longer than npix must error (silent truncation would train
    on misaligned flux), matching the Python engine's loud ragged-stack
    failure; shorter arrays error too."""
    for n_wrong in (NPIX + 17, NPIX - 3):
        p = str(tmp_path / f"wrong_{n_wrong}.npz")
        np.savez(p, flux=np.ones(n_wrong, np.float32),
                 error=np.ones(n_wrong, np.float32), z=np.float32(2.5))
        with pytest.raises(IOError, match="does not match the common grid"):
            native.read_spectra_native([p], NPIX)
