"""Back-to-back epochs with NO per-epoch host sync: true kernel time."""
import time
import jax, jax.numpy as jnp
import numpy as np
import qfa_tpu
from qfa_tpu.data.loader import ResidualDataset
from qfa_tpu.data.synthetic import generate
from qfa_tpu.models import random_init
from qfa_tpu.ops.epoch_kernel import fused_train_epoch
from qfa_tpu.train import adam

print("device:", jax.devices()[0], flush=True)
grid = qfa_tpu.make_grid()
nh, n, b, tb = 8, 65536, 4096, 256
params = random_init(jax.random.key(0), grid.npix, grid.nb, nh)
mu = jnp.ones((grid.npix,), jnp.float32)
syn = jax.jit(lambda k: generate(k, params, mu, grid, n, mask_frac=0.1))(jax.random.key(1))
full = jax.jit(lambda s: s.to_batch(mu))(syn)
data = ResidualDataset(delta=full.delta, error=full.error,
                       zabs=full.zabs, mask=full.mask)
st = adam.init(params)
pm, mm, vm = params, st.m, st.v

def run(pm, mm, vm, ep, k):
    perm = jax.random.permutation(jax.random.key(k), n // tb)
    return fused_train_epoch(
        pm, mm, vm, data.delta, data.error, data.zabs, perm, data.mask,
        epoch=jnp.asarray(ep, jnp.int32), n_batches=n // b, tile_batch=tb,
        learning_rate=1e-3, weight_decay=0.1)

t0 = time.perf_counter()
out = run(pm, mm, vm, 0, 2)
_ = float(np.asarray(out.loss_sums[0]))
print(f"compile+first {time.perf_counter()-t0:.1f} s", flush=True)
pm, mm, vm = out.params, out.m, out.v

K = 20
t0 = time.perf_counter()
for k in range(K):
    out = run(pm, mm, vm, 1 + k, 3 + k)
    pm, mm, vm = out.params, out.m, out.v
_ = float(np.asarray(out.loss_sums[-1]))  # single sync at the end
dt = (time.perf_counter() - t0) / K
print(f"no-sync epoch: {dt*1e3:.2f} ms -> {n/dt:,.0f} spectra/s", flush=True)
