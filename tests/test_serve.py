"""Online-serving surface: warm fixed-shape predictor + HTTP endpoint.

The reference has no serving path (batch loop only,
``/root/reference/main.py:86-100``); qfa_tpu.serve adds one. These tests
pin it to the core batched ``predict`` on the XLA engine (the CPU test
platform) — the fused TPU engine reuses the same production kernel the
fused-inference tests already pin.
"""

import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import qfa_tpu
from qfa_tpu.models import random_init, save_npz
from qfa_tpu.models.qfa import ModelOptions, predict
from qfa_tpu.serve import QFAPredictor, make_http_server

GRID = dict(lammin=1030.0, lammax=1080.0, loglam_delta=1e-3)
NH = 4


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    grid = qfa_tpu.make_grid(*GRID.values())
    params = random_init(jax.random.key(0), grid.npix, grid.nb, NH)
    mu = np.linspace(0.8, 1.2, grid.npix).astype(np.float32)
    path = str(tmp_path_factory.mktemp("serve") / "model.npz")
    save_npz(path, params, mu)
    return path, grid, params, mu


@pytest.fixture(scope="module")
def request_data(ckpt):
    _, grid, params, mu = ckpt
    rng = np.random.default_rng(3)
    n = 13
    flux = rng.normal(1.0, 0.3, (n, grid.npix)).astype(np.float32)
    error = rng.uniform(0.05, 0.2, (n, grid.npix)).astype(np.float32)
    zqso = rng.uniform(2.2, 3.2, (n,)).astype(np.float32)
    return flux, error, zqso


def expected(ckpt, flux, error, zqso, mask=None):
    _, grid, params, mu = ckpt
    if mask is None:
        mask = np.ones_like(flux, bool)
    m = mask.astype(np.float32)
    zabs = grid.zabs(zqso).astype(np.float32)
    return predict(
        params, jnp.asarray(mu),
        jnp.asarray(np.where(mask, flux, 0.0)),
        jnp.asarray(np.where(mask, error, 0.0)),
        jnp.asarray(zabs), jnp.asarray(m), ModelOptions(),
    )


def test_predictor_matches_core_predict_with_chunking(ckpt, request_data):
    """13 spectra through max_batch=8 (pad + 2 chunks) == one direct call."""
    path = ckpt[0]
    flux, error, zqso = request_data
    pred = QFAPredictor(path, max_batch=8, engine="xla", **GRID)
    out = pred.predict(flux, error, zqso)
    ref = expected(ckpt, flux, error, zqso)
    np.testing.assert_allclose(out["ll"], np.asarray(ref.ll), rtol=2e-5)
    np.testing.assert_allclose(
        out["continuum"], np.asarray(ref.continuum), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        out["hmean"], np.asarray(ref.hmean), rtol=1e-4, atol=1e-6
    )
    assert out["hcov"].shape == (13, NH, NH)
    assert (out["n_obs"] == flux.shape[1]).all()


def test_predictor_sentinel_equals_explicit_mask(ckpt, request_data):
    path, grid, *_ = ckpt
    flux, error, zqso = request_data
    flux, error = flux.copy(), error.copy()
    mask = np.ones_like(flux, bool)
    mask[:, 3:7] = False
    f_s = flux.copy()
    f_s[:, 3:7] = -999.0  # reference missing-pixel sentinel
    pred = QFAPredictor(path, max_batch=16, engine="xla", **GRID)
    out_sentinel = pred.predict(f_s, error, zqso)
    out_masked = pred.predict(flux, error, zqso, mask=mask)
    np.testing.assert_allclose(out_sentinel["ll"], out_masked["ll"], rtol=1e-6)
    assert (out_sentinel["n_obs"] == grid.npix - 4).all()


def test_predictor_validates_shapes(ckpt):
    path, grid, *_ = ckpt
    pred = QFAPredictor(path, max_batch=4, engine="xla", **GRID)
    with pytest.raises(ValueError, match="pixels"):
        pred.predict(
            np.ones((2, grid.npix + 1)), np.ones((2, grid.npix + 1)),
            np.array([2.5, 2.5]),
        )
    with pytest.raises(ValueError, match="shape mismatch"):
        pred.predict(
            np.ones((2, grid.npix)), np.ones((3, grid.npix)),
            np.array([2.5, 2.5]),
        )


def test_predictor_rejects_wrong_grid(ckpt):
    path = ckpt[0]
    with pytest.raises(ValueError, match="grid"):
        QFAPredictor(path, engine="xla")  # default SDSS grid != tiny ckpt


def test_predictor_empty_batch(ckpt):
    """Zero spectra is a valid request: empty, correctly-shaped outputs."""
    path, grid, *_ = ckpt
    pred = QFAPredictor(path, max_batch=4, engine="xla", **GRID)
    out = pred.predict(
        np.zeros((0, grid.npix), np.float32),
        np.zeros((0, grid.npix), np.float32),
        np.zeros((0,), np.float32),
    )
    assert out["ll"].shape == (0,)
    assert out["hmean"].shape == (0, NH)
    assert out["hcov"].shape == (0, NH, NH)
    assert out["continuum"].shape == (0, grid.npix)
    assert out["n_obs"].shape == (0,)


def test_http_nonfinite_outputs_serialize_as_null(ckpt, request_data):
    """A NaN in the request must never produce invalid JSON (bare NaN
    tokens) — non-finite outputs come back as null."""
    path = ckpt[0]
    flux, error, zqso = request_data
    f = flux[:2].copy()
    f[0, 0] = np.nan  # poisons spectrum 0's likelihood
    pred = QFAPredictor(path, max_batch=4, engine="xla", **GRID)
    srv = make_http_server(pred, "127.0.0.1", 0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        body = json.dumps({
            "flux": f.tolist(), "error": error[:2].tolist(),
            "zqso": zqso[:2].tolist(),
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            raw = r.read()
        out = json.loads(raw, parse_constant=lambda s: pytest.fail(
            f"response carries a non-strict JSON token {s!r}"
        ))
        assert out["ll"][0] is None  # poisoned spectrum
        assert out["ll"][1] is not None  # healthy one untouched
    finally:
        srv.shutdown()


def test_http_endpoint_round_trip(ckpt, request_data):
    path = ckpt[0]
    flux, error, zqso = request_data
    pred = QFAPredictor(path, max_batch=16, engine="xla", **GRID)
    srv = make_http_server(pred, "127.0.0.1", 0)  # ephemeral port
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"
        assert health["npix"] == ckpt[1].npix and health["nh"] == NH

        body = json.dumps({
            "flux": flux[:3].tolist(),
            "error": error[:3].tolist(),
            "zqso": zqso[:3].tolist(),
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        direct = pred.predict(flux[:3], error[:3], zqso[:3])
        np.testing.assert_allclose(out["ll"], direct["ll"], rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(out["continuum"]), direct["continuum"], rtol=1e-6
        )

        # malformed request -> 400, not a crash
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=b'{"flux": [[1.0]]}',
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400
    finally:
        srv.shutdown()


def test_http_concurrent_requests(ckpt, request_data):
    """Parallel POSTs through ThreadingHTTPServer: each handler thread
    funnels into the predictor's lock-guarded jit, and every response must
    match a direct predict of ITS OWN payload (no cross-request mixing,
    no dropped/errored requests under concurrency) — VERDICT r3 polish."""
    path = ckpt[0]
    flux, error, zqso = request_data
    pred = QFAPredictor(path, max_batch=4, engine="xla", **GRID)
    pred.warmup()
    srv = make_http_server(pred, "127.0.0.1", 0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()

    n_threads, results, errors = 8, {}, {}

    def worker(i):
        # distinct single-spectrum payload per thread (roll the batch)
        j = i % flux.shape[0]
        body = json.dumps({
            "flux": flux[j : j + 1].tolist(),
            "error": error[j : j + 1].tolist(),
            "zqso": zqso[j : j + 1].tolist(),
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=body,
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=120) as r:
                results[i] = json.loads(r.read())
        except Exception as e:  # pragma: no cover - failure detail
            errors[i] = repr(e)

    threads = [
        threading.Thread(target=worker, args=(i,)) for i in range(n_threads)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    try:
        assert not errors, f"concurrent requests failed: {errors}"
        assert len(results) == n_threads
        for i, out in results.items():
            j = i % flux.shape[0]
            direct = pred.predict(
                flux[j : j + 1], error[j : j + 1], zqso[j : j + 1]
            )
            np.testing.assert_allclose(
                out["ll"], direct["ll"], rtol=1e-6, err_msg=f"req {i}"
            )
            np.testing.assert_allclose(
                np.asarray(out["continuum"]), direct["continuum"],
                rtol=1e-6, err_msg=f"req {i}",
            )
    finally:
        srv.shutdown()


def test_fused_interpret_engine_matches_xla(ckpt, request_data):
    """The TPU serving path (fused kernel, interpret mode) == XLA engine."""
    path = ckpt[0]
    flux, error, zqso = request_data
    xla = QFAPredictor(path, max_batch=8, engine="xla", **GRID)
    fused = QFAPredictor(
        path, max_batch=8, engine="fused", interpret=True, **GRID
    )
    a = xla.predict(flux[:5], error[:5], zqso[:5])
    b = fused.predict(flux[:5], error[:5], zqso[:5])
    np.testing.assert_allclose(b["ll"], a["ll"], rtol=2e-4)
    np.testing.assert_allclose(
        b["continuum"], a["continuum"], rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(b["hmean"], a["hmean"], rtol=1e-3, atol=1e-5)


def test_predictor_empty_list_request(ckpt):
    """A JSON `[]` request (shape (0,) after asarray) reaches the empty
    result path instead of tripping the npix check (r3 review finding)."""
    path, grid, *_ = ckpt
    pred = QFAPredictor(path, max_batch=4, engine="xla", **GRID)
    out = pred.predict([], [], [])
    assert out["ll"].shape == (0,)
    assert out["hmean"].shape == (0, NH)
    assert out["continuum"].shape == (0, grid.npix)
    assert out["n_obs"].shape == (0,)
