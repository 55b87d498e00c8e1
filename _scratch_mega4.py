"""Single-dispatch epoch (perm in-jit), chained with one sync at end."""
import time
import jax, jax.numpy as jnp
import numpy as np
import qfa_tpu
from qfa_tpu.data.loader import ResidualDataset
from qfa_tpu.data.synthetic import generate
from qfa_tpu.models import random_init
from qfa_tpu.train import TrainConfig, TrainState, adam, make_pallas_epoch_fn

print("device:", jax.devices()[0], flush=True)

def bench(name, grid, nh, n, b, tb, trials=20):
    params = random_init(jax.random.key(0), grid.npix, grid.nb, nh)
    mu = jnp.ones((grid.npix,), jnp.float32)
    syn = jax.jit(lambda k: generate(k, params, mu, grid, n, mask_frac=0.1))(jax.random.key(1))
    full = jax.jit(lambda s: s.to_batch(mu))(syn)
    data = ResidualDataset(delta=full.delta, error=full.error,
                           zabs=full.zabs, mask=full.mask)
    cfg = TrainConfig(batch_size=b)
    fn = make_pallas_epoch_fn(cfg, tile_batch=tb)
    st = TrainState(params, adam.init(params))
    t0 = time.perf_counter()
    st, loss = fn(st, data, jax.random.key(2))
    _ = float(loss)
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f} s loss={float(loss):.2f}", flush=True)
    t0 = time.perf_counter()
    for k in range(trials):
        st, loss = fn(st, data, jax.random.key(3 + k))
    _ = float(loss)  # single sync
    dt = (time.perf_counter() - t0) / trials
    print(f"{name}: {dt*1e3:.2f} ms/epoch -> {n/dt:,.0f} spectra/s  loss={float(loss):.2f}", flush=True)

grid = qfa_tpu.make_grid()
bench("sdss", grid, 8, 65536, 4096, 256)
desi = qfa_tpu.make_grid(1113.5772, 1600.0, 1.7029661e-05)
bench("desi", desi, 8, 16384, 1024, 64, trials=10)
