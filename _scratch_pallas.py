import time
import jax, jax.numpy as jnp
import qfa_tpu
from qfa_tpu.data.synthetic import generate
from qfa_tpu.data.loader import ResidualDataset, batch_indices
from qfa_tpu.models import random_init
from qfa_tpu.train import TrainConfig, TrainState, adam
from qfa_tpu.train.loop import make_step_fn, make_pallas_step_fn, make_epoch_fn

print("device:", jax.devices()[0])
grid = qfa_tpu.make_grid()
nh, n, b = 8, 65536, 4096
key = jax.random.key(0)
params = random_init(key, grid.npix, grid.nb, nh)
mu = jnp.ones((grid.npix,), jnp.float32)
syn = jax.jit(lambda k: generate(k, params, mu, grid, n, mask_frac=0.1))(jax.random.key(1))
full = jax.jit(lambda s: s.to_batch(mu))(syn)
data = ResidualDataset(delta=full.delta, error=full.error, zabs=full.zabs, mask=full.mask)
jax.block_until_ready(data.delta)

cfg = TrainConfig(batch_size=b)

def timeit(fn, *args, iters=5):
    out = fn(*args); jax.block_until_ready(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args); jax.block_until_ready(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best, out

# XLA single step (standalone dispatch)
batch = data.gather(jnp.arange(b))
step = make_step_fn(cfg)
st = TrainState(params, adam.init(params))
# donation: re-create state each call is wrong; measure with fresh state warm
st, _ = step(st, batch)
jax.block_until_ready(st.params.F)
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    st, loss = step(st, batch)
    jax.block_until_ready(st.params.F)
    ts.append(time.perf_counter() - t0)
print(f"XLA step: {min(ts)*1e3:.2f} ms -> {b/min(ts):,.0f} spectra/s")

# Pallas fused step
try:
    t0 = time.perf_counter()
    pstep = make_pallas_step_fn(cfg, tile_batch=256)
    st2 = TrainState(random_init(key, grid.npix, grid.nb, nh), adam.init(params))
    st2, ploss = pstep(st2, batch)
    jax.block_until_ready(st2.params.F)
    print(f"pallas compile+first: {time.perf_counter()-t0:.1f} s, loss={float(ploss):.3f}")
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        st2, ploss = pstep(st2, batch)
        jax.block_until_ready(st2.params.F)
        ts.append(time.perf_counter() - t0)
    print(f"Pallas step (TB=256): {min(ts)*1e3:.2f} ms -> {b/min(ts):,.0f} spectra/s")
except Exception as e:
    import traceback; traceback.print_exc()
    print("PALLAS FAILED:", type(e).__name__)
