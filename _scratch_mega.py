import time
import jax, jax.numpy as jnp
import numpy as np
import qfa_tpu
from qfa_tpu.data.synthetic import generate
from qfa_tpu.models import random_init
from qfa_tpu.ops.epoch_kernel import fused_train_epoch

print("device:", jax.devices()[0], flush=True)
grid = qfa_tpu.make_grid()
nh, n, b = 8, 65536, 4096
TB = 256
n_batches = n // b
params = random_init(jax.random.key(0), grid.npix, grid.nb, nh)
mu = jnp.ones((grid.npix,), jnp.float32)
syn = jax.jit(lambda k: generate(k, params, mu, grid, n, mask_frac=0.1))(jax.random.key(1))
full = jax.jit(lambda s: s.to_batch(mu))(syn)
zeros = jax.tree.map(jnp.zeros_like, params)
m0, v0 = zeros, jax.tree.map(jnp.zeros_like, params)

n_tiles = n // TB
perm = jax.random.permutation(jax.random.key(2), n_tiles)

t0 = time.perf_counter()
out = fused_train_epoch(
    params, m0, v0, full.delta, full.error, full.zabs, perm,
    epoch=jnp.asarray(0, jnp.int32), n_batches=n_batches, tile_batch=TB,
    learning_rate=1e-3, weight_decay=0.1,
)
l0 = float(np.asarray(out.loss_sums[0]))
print(f"compile+first: {time.perf_counter()-t0:.1f} s  loss0={l0/4096:.2f}", flush=True)

# chained timing (params feed back; fresh perm per epoch)
state = (out.params, out.m, out.v)
ep = 1
t0 = time.perf_counter()
TRIALS = 10
for k in range(TRIALS):
    perm = jax.random.permutation(jax.random.key(10 + k), n_tiles)
    out = fused_train_epoch(
        state[0], state[1], state[2], full.delta, full.error, full.zabs,
        perm, epoch=jnp.asarray(ep, jnp.int32),
        n_batches=n_batches, tile_batch=TB,
        learning_rate=1e-3, weight_decay=0.1,
    )
    state = (out.params, out.m, out.v)
    ep += 1
final = float(np.asarray(out.loss_sums[-1]))
dt = (time.perf_counter() - t0) / TRIALS
print(f"mega epoch: {dt*1e3:.1f} ms -> {n/dt:,.0f} spectra/s  "
      f"(XLA epoch 66.7 ms / 983k)  last-batch loss {final/4096:.2f}", flush=True)
