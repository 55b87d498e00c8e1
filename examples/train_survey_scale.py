"""Survey-scale training demo: 500k+ spectra resident on one TPU chip.

The BASELINE.md north star asks for a 500k-spectrum factor-model training
run in under 10 minutes. With the whole-epoch Pallas trainer
(``qfa_tpu.train.fit_pallas``) in the production resident layout — mask
derived in-kernel (masked pixels carry ``error == 0``) and absorber
redshifts rebuilt in-kernel from a 512 B/spectrum ``log1p(zqso)`` column —
each SDSS-scale spectrum costs ~15.4 KB of HBM, so 786,432 spectra fit
resident in one v5e's 16 GB and 500 epochs project to under a minute.

Usage (real TPU; synthetic data by default):

    python examples/train_survey_scale.py --n 786432 --epochs 20

With a real survey, build the residual buffers through the data layer
instead (``SpectraDataset.from_paths`` -> ``estimate_mu`` ->
``make_residuals``, then swap ``zabs`` for ``qfa_tpu.ops.zq_column``) —
everything downstream is identical.
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
import time

import jax
import jax.numpy as jnp

import qfa_tpu
from qfa_tpu.data.loader import ResidualDataset
from qfa_tpu.models import random_init
from qfa_tpu.ops import loglam_row
from qfa_tpu.train import TrainConfig, TrainState, adam, make_pallas_epoch_fn


def build_synthetic_resident(grid, n: int, seed: int = 0) -> ResidualDataset:
    """Pre-padded resident residual buffers in the production layout
    (delta, error, zq column), built chunk-by-chunk with donation so peak
    memory is the final footprint plus one chunk."""
    from qfa_tpu.ops.fused_step import _round_up

    p = _round_up(grid.npix, 128)
    chunk = 32768
    if n % chunk:
        raise SystemExit(f"--n must be a multiple of {chunk}")

    @jax.jit
    def make_chunk(key):
        kz, kd, ke = jax.random.split(key, 3)
        z = jax.random.uniform(kz, (chunk,), jnp.float32, 2.0, 3.5)
        zq = (
            jnp.zeros((chunk, 128), jnp.float32)
            .at[:, 0].set(jnp.log1p(z))
            .at[:, 1].set(1.0)  # weight lane: every synthetic row is real
        )
        delta = 0.4 * jax.random.normal(kd, (chunk, p), jnp.float32)
        error = jax.random.uniform(ke, (chunk, p), jnp.float32, 0.05, 0.3)
        live = (jnp.arange(p) < grid.npix).astype(jnp.float32)
        return delta * live, error * live, zq

    @jax.jit
    def alloc():
        return (jnp.zeros((n, p), jnp.float32),
                jnp.zeros((n, p), jnp.float32),
                jnp.zeros((n, 128), jnp.float32))

    write = jax.jit(
        lambda buf, c, i: jax.lax.dynamic_update_slice(buf, c, (i, 0)),
        donate_argnums=(0,),
    )
    delta, error, zq = alloc()
    for i in range(n // chunk):
        cd, ce, cz = make_chunk(jax.random.fold_in(jax.random.key(seed), i))
        delta = write(delta, cd, i * chunk)
        error = write(error, ce, i * chunk)
        zq = write(zq, cz, i * chunk)
    jax.block_until_ready(error)
    return ResidualDataset(delta=delta, error=error, zabs=zq, mask=None)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=786432)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch_size", type=int, default=4096)
    ap.add_argument("--nh", type=int, default=8)
    args = ap.parse_args()

    grid = qfa_tpu.make_grid()
    gb = args.n * (2 * 1920 * 4 + 512) / 2**30
    print(f"building {args.n:,} resident spectra ({gb:.1f} GiB on device)...")
    data = build_synthetic_resident(grid, args.n)

    params = random_init(jax.random.key(1), grid.npix, grid.nb, args.nh)
    cfg = TrainConfig(batch_size=args.batch_size)
    # derive_mask: the mask never exists on device (error==0 == masked);
    # loglam: absorber redshifts are rebuilt in-kernel from the zq column
    epoch_fn = make_pallas_epoch_fn(
        cfg, tile_batch=256, derive_mask=True, loglam=loglam_row(grid.wav)
    )
    state = TrainState(params, adam.init(params))

    state, loss = epoch_fn(state, data, jax.random.key(2))  # compile
    print(f"epoch 0 loss {float(loss):.2f}")
    t0 = time.perf_counter()
    for epoch in range(1, args.epochs):
        state, loss = epoch_fn(state, data, jax.random.fold_in(
            jax.random.key(2), epoch))
    final = float(loss)  # one host sync closes the pipeline
    dt = (time.perf_counter() - t0) / max(args.epochs - 1, 1)
    print(f"{dt*1e3:.1f} ms/epoch -> {args.n/dt:,.0f} spectra/s; "
          f"500 epochs of {args.n:,} spectra project to "
          f"{500*dt/60:.2f} minutes (north star: <10)")
    print(f"final epoch loss {final:.2f}")


if __name__ == "__main__":
    main()
