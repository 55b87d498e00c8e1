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
        sel = rng.choice(NPIX, 5, replace=False)
        flux[sel] = -999.0
        err[sel] = -999.0
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
    f1, e1, m1, z1 = read_spectra(survey, engine="python")
    f2, e2, m2, z2 = native.read_spectra_native(survey, NPIX)
    np.testing.assert_allclose(f2, f1, atol=1e-6)
    np.testing.assert_allclose(e2, e1, atol=1e-6)
    np.testing.assert_array_equal(m2, m1)
    np.testing.assert_allclose(z2, z1, atol=1e-5)


@needs_native
def test_auto_engine_uses_native(survey):
    f, e, m, z = read_spectra(survey, engine="auto")
    f1, e1, m1, z1 = read_spectra(survey, engine="python")
    np.testing.assert_allclose(f, f1, atol=1e-6)
    np.testing.assert_array_equal(m, m1)


@needs_native
def test_native_handles_compressed_and_stored(survey):
    # survey alternates savez / savez_compressed; both must parse
    f, _, m, _ = native.read_spectra_native(survey, NPIX)
    assert np.isfinite(f).all()
    assert (~m).sum() == 24 * 5


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
