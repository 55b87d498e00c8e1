"""Survey-scale training demo: 500k+ spectra resident on one TPU chip.

The BASELINE.md north star asks for a 500k-spectrum factor-model training
run in under 10 minutes. With the whole-epoch Pallas trainer
(``qfa_tpu.train.fit_pallas``) and the in-kernel mask (masked pixels carry
``error == 0``, so the mask array never exists), 524,288 SDSS-scale
spectra fit resident in one v5e's HBM (~23 KB/spectrum) and 500 epochs
project to under a minute.

Usage (real TPU; synthetic data by default):

    python examples/train_survey_scale.py --n 524288 --epochs 20

With a real survey, build the residual buffers through the data layer
instead (``SpectraDataset.from_paths`` -> ``estimate_mu`` ->
``make_residuals``) — everything downstream is identical.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import qfa_tpu
from qfa_tpu.data.grid import LYA_WAVELENGTH
from qfa_tpu.data.loader import ResidualDataset
from qfa_tpu.models import random_init
from qfa_tpu.train import TrainConfig, TrainState, adam, make_pallas_epoch_fn


def build_synthetic_resident(grid, n: int, seed: int = 0) -> ResidualDataset:
    """Pre-padded resident residual buffers, built chunk-by-chunk with
    donation so peak memory is the final footprint plus one chunk."""
    from qfa_tpu.ops.fused_step import _round_up

    p = _round_up(grid.npix, 128)
    chunk = 32768
    if n % chunk:
        raise SystemExit(f"--n must be a multiple of {chunk}")
    blue = jnp.asarray(grid.blue, jnp.float32)

    @jax.jit
    def make_chunk(key):
        kz, kd, ke = jax.random.split(key, 3)
        z = jax.random.uniform(kz, (chunk,), jnp.float32, 2.0, 3.5)
        zab = (1.0 + z)[:, None] * blue / LYA_WAVELENGTH - 1.0
        zab = jnp.pad(zab, ((0, 0), (0, p - grid.nb)))
        delta = 0.4 * jax.random.normal(kd, (chunk, p), jnp.float32)
        error = jax.random.uniform(ke, (chunk, p), jnp.float32, 0.05, 0.3)
        live = (jnp.arange(p) < grid.npix).astype(jnp.float32)
        return delta * live, error * live, zab

    @jax.jit
    def alloc():
        return tuple(jnp.zeros((n, p), jnp.float32) for _ in range(3))

    write = jax.jit(
        lambda buf, c, i: jax.lax.dynamic_update_slice(buf, c, (i, 0)),
        donate_argnums=(0,),
    )
    delta, error, zabs = alloc()
    for i in range(n // chunk):
        cd, ce, cz = make_chunk(jax.random.fold_in(jax.random.key(seed), i))
        delta = write(delta, cd, i * chunk)
        error = write(error, ce, i * chunk)
        zabs = write(zabs, cz, i * chunk)
    jax.block_until_ready(error)
    return ResidualDataset(delta=delta, error=error, zabs=zabs, mask=None)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=524288)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch_size", type=int, default=4096)
    ap.add_argument("--nh", type=int, default=8)
    args = ap.parse_args()

    grid = qfa_tpu.make_grid()
    print(f"building {args.n:,} resident spectra "
          f"({args.n * 3 * 1920 * 4 / 1e9:.1f} GB on device)...")
    data = build_synthetic_resident(grid, args.n)

    params = random_init(jax.random.key(1), grid.npix, grid.nb, args.nh)
    cfg = TrainConfig(batch_size=args.batch_size)
    # derive_mask: the mask never exists on device (error==0 == masked)
    epoch_fn = make_pallas_epoch_fn(cfg, tile_batch=256, derive_mask=True)
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
