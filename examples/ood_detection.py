"""Out-of-distribution detection demo — the reference's third headline
capability (``/root/reference/README.md:18-19``): the per-spectrum
marginal NLL under the trained factor model flags anomalous spectra.

This script trains a QFA model on synthetic in-distribution spectra,
injects three kinds of anomalies, scores EVERY spectrum with the
stats-only fused prediction kernel (one launch, ~320 B/spectrum output),
and reports how cleanly the NLL separates the populations:

* ``broken``  — continuum replaced by an unrelated smooth shape
* ``dla``     — a deep, wide absorption trough (damped-Lya-like)
* ``noisy``   — reported errors 5x smaller than the true noise

Run: ``python examples/ood_detection.py`` (real TPU; pass
``--interpret`` for CPU).
"""

from __future__ import annotations

# allow running from a source checkout without installation
try:  # noqa: SIM105
    import qfa_tpu  # noqa: F401
except ModuleNotFoundError:
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from qfa_tpu.utils import honor_cpu_request

honor_cpu_request()  # the dev image pins the TPU plugin; honor cpu requests

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import qfa_tpu
from qfa_tpu.data.loader import ResidualDataset
from qfa_tpu.data.synthetic import generate
from qfa_tpu.models import random_init
from qfa_tpu.ops import fused_predict, loglam_row, zq_column
from qfa_tpu.train import TrainConfig, TrainState, adam
from qfa_tpu.train.pallas_engine import make_pallas_epoch_fn


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--n-anomalous", type=int, default=512)
    ap.add_argument("--epochs", type=int, default=80)
    ap.add_argument("--learning-rate", type=float, default=1e-2)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    grid = qfa_tpu.make_grid()
    nh = 8
    # realistic generative scales (random_init's Psi=omega=1 would put ~1
    # sigma of model noise on every pixel and swallow any anomaly): a few
    # percent diagonal scatter + a low-rank continuum subspace of ~0.2 rms
    true = random_init(jax.random.key(0), grid.npix, grid.nb, nh)
    true = true._replace(
        F=0.3 * true.F,
        Psi=jnp.full((grid.npix,), 0.02, jnp.float32),
        omega=jnp.full((grid.nb,), 0.2, jnp.float32),
    )
    mu = jnp.ones((grid.npix,), jnp.float32) * 1.1

    # ---- in-distribution corpus + training --------------------------------
    syn = jax.jit(
        lambda k: generate(k, true, mu, grid, args.n, mask_frac=0.1)
    )(jax.random.key(1))
    full = jax.jit(lambda s: s.to_batch(mu))(syn)
    data = ResidualDataset(delta=full.delta, error=full.error,
                           zabs=zq_column(syn.zqso), mask=None)
    cfg = TrainConfig(batch_size=2048, weight_decay=0.0,
                      learning_rate=args.learning_rate)
    epoch_fn = make_pallas_epoch_fn(
        cfg, tile_batch=256, derive_mask=True, loglam=loglam_row(grid.wav),
        interpret=args.interpret,
    )
    state = TrainState(random_init(jax.random.key(2), grid.npix, grid.nb, nh),
                       adam.init(true))
    for e in range(args.epochs):
        state, loss = epoch_fn(state, data, jax.random.fold_in(
            jax.random.key(3), e))
    print(f"trained {args.epochs} epochs, final loss {float(loss):.2f}")

    # ---- inject anomalies -------------------------------------------------
    k = args.n_anomalous
    flux = np.array(syn.flux * syn.mask)  # np.array: writable host copies
    error = np.array(syn.error * syn.mask)
    mask = np.asarray(syn.mask)
    rng = np.random.default_rng(7)
    idx = rng.choice(args.n, size=3 * k, replace=False)
    broken, dla, noisy = idx[:k], idx[k : 2 * k], idx[2 * k :]
    wav = np.asarray(grid.wav, np.float32)

    # unrelated smooth continuum (sinusoid over the grid)
    shape = 1.1 + 0.5 * np.sin(np.linspace(0, 6 * np.pi, grid.npix))
    flux[broken] = (shape[None, :]
                    + error[broken] * rng.standard_normal((k, grid.npix))
                    ) * mask[broken]
    # deep wide trough at a random center
    centers = rng.uniform(wav[200], wav[-200], size=k)
    widths = rng.uniform(15.0, 40.0, size=k)
    trough = 1.0 - 0.95 * np.exp(
        -((wav[None, :] - centers[:, None]) / widths[:, None]) ** 2
    )
    flux[dla] = flux[dla] * trough
    # over-confident errors
    error[noisy] = error[noisy] / 5.0

    labels = np.zeros(args.n, np.int32)
    labels[broken], labels[dla], labels[noisy] = 1, 2, 3

    # ---- score: stats-only fused kernel (one launch per device) -----------
    # on a multi-chip mesh the sweep shards the spectrum axis with zero
    # collectives (qfa_tpu.parallel.fused_predict_dp)
    tb = 512
    kw = dict(tile_batch=tb, stats_only=True, loglam=loglam_row(grid.wav),
              derive_zabs=True, interpret=args.interpret)
    fargs = (state.params, mu, jnp.asarray(flux), jnp.asarray(error),
             zq_column(syn.zqso), None)
    if jax.device_count() > 1 and args.n % (jax.device_count() * tb) == 0:
        from qfa_tpu.parallel import fused_predict_dp, make_mesh

        res = fused_predict_dp(*fargs, mesh=make_mesh(), **kw)
    else:
        res = fused_predict(*fargs, **kw)
    scores = np.asarray(res.ll) / np.maximum(np.asarray(res.n_obs), 1.0)

    # ---- report separation ------------------------------------------------
    def auc(pos, neg):
        """P(score_pos > score_neg) by rank statistic."""
        allv = np.concatenate([pos, neg])
        ranks = allv.argsort().argsort().astype(np.float64) + 1
        r_pos = ranks[: len(pos)].sum()
        return (r_pos - len(pos) * (len(pos) + 1) / 2) / (
            len(pos) * len(neg)
        )

    clean = scores[labels == 0]
    print(f"clean    : median per-pixel NLL {np.median(clean):+.3f}")
    for name, lab in (("broken", 1), ("dla", 2), ("noisy", 3)):
        pop = scores[labels == lab]
        print(f"{name:<9}: median {np.median(pop):+.3f}   "
              f"AUC vs clean {auc(pop, clean):.3f}")
    top = np.argsort(-scores)[: 3 * k]
    hit = np.isin(top, idx).mean()
    print(f"precision@{3 * k} (top-scored vs injected): {hit:.3f}")


if __name__ == "__main__":
    main()
