import time, functools
import jax, jax.numpy as jnp
import qfa_tpu
from qfa_tpu.data.synthetic import generate
from qfa_tpu.data.loader import ResidualDataset, batch_indices
from qfa_tpu.models import random_init
from qfa_tpu.models.qfa import normalize_with_counts
from qfa_tpu.models.params import clip_params
from qfa_tpu.ops.fused_step import fused_loss_grads
from qfa_tpu.train import TrainConfig, TrainState, adam
from qfa_tpu.train.loop import make_epoch_fn

print("device:", jax.devices()[0], flush=True)
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
adam_cfg = cfg.adam_config()

@functools.partial(jax.jit, donate_argnums=(0,))
def pallas_epoch(state, data, idx):
    def batch_step(carry, b_idx):
        batch = data.gather(b_idx)
        out = fused_loss_grads(carry.params, batch, tau_which="becker",
                               tile_batch=512)
        n_real = jnp.maximum(jnp.sum(batch.weight), 1.0)
        loss = out.loss_sum / n_real
        grads = normalize_with_counts(out.grads, out.counts)
        new_params, new_opt = adam.apply_update(carry.params, grads,
                                                carry.opt_state, adam_cfg)
        new_params = clip_params(new_params, cfg.bounds)
        return TrainState(new_params, new_opt), loss
    state, losses = jax.lax.scan(batch_step, state, idx)
    return TrainState(state.params, adam.next_epoch(state.opt_state)), jnp.mean(losses)

idx = batch_indices(jax.random.key(2), n, b)
st = TrainState(params, adam.init(params))
t0 = time.perf_counter()
st, loss = pallas_epoch(st, data, idx)
jax.block_until_ready(st.params.F)
print(f"scan-around-pallas compile+first: {time.perf_counter()-t0:.1f} s  loss={float(loss):.2f}", flush=True)
ts = []
for trial in range(5):
    idx = batch_indices(jax.random.key(3+trial), n, b)
    t0 = time.perf_counter()
    st, loss = pallas_epoch(st, data, idx)
    jax.block_until_ready(st.params.F)
    ts.append(time.perf_counter() - t0)
print(f"pallas epoch: {min(ts)*1e3:.1f} ms -> {n/min(ts):,.0f} spectra/s   (XLA epoch baseline ~66.7 ms / 983k)", flush=True)
