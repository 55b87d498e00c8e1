import time
import jax, jax.numpy as jnp
import numpy as np

K = 16

def bench_chain(fn, x, state0, trials=3):
    """fn(x, state) -> state; probe = tiny slice of state forces sync."""
    s = fn(x, state0)
    float(np.asarray(jax.tree.leaves(s)[0]).ravel()[0])
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        s = fn(x, s)
        float(np.asarray(jax.tree.leaves(s)[0]).ravel()[0])
        times.append(time.perf_counter() - t0)
    return min(times)

n, p = 65536, 1913
x = jax.random.normal(jax.random.key(0), (n, p), jnp.float32)
_ = np.asarray(x[0]); gb = n * p * 4 / 1e9

# copy with small probe: carry big y, return (probe, y) -- probe first leaf
@jax.jit
def copy_scan(x, st):
    probe, y = st
    def step(y, c):
        return y * (1.0 + 1e-9 * c), None
    y, _ = jax.lax.scan(step, y, jnp.arange(K, dtype=jnp.float32) + probe[0])
    return (y[0, :1], y)
t = bench_chain(copy_scan, x, (jnp.zeros((1,)), x + 0.0)) / K
print(f"copy: {t*1e3:.2f} ms/pass -> {2*gb/t:.1f} GB/s", flush=True)

a16 = jax.random.normal(jax.random.key(2), (4096, 4096), jnp.bfloat16)
b16 = jax.random.normal(jax.random.key(3), (4096, 4096), jnp.bfloat16)
fl = 2 * 4096**3
@jax.jit
def mm_scan(ab, st):
    a16, b16 = ab
    probe, acc = st
    def step(acc, c):
        return (a16 * c.astype(jnp.bfloat16)) @ b16 + acc * jnp.bfloat16(1e-8), None
    acc, _ = jax.lax.scan(step, acc, jnp.arange(1.0, K + 1.0) + probe[0])
    return (acc[0, :1].astype(jnp.float32), acc)
t = bench_chain(mm_scan, (a16, b16), (jnp.zeros((1,)), jnp.zeros((4096, 4096), jnp.bfloat16))) / K
print(f"bf16 4096^3: {t*1e3:.2f} ms -> {fl/t/1e12:.2f} TF/s", flush=True)

af, bf = a16.astype(jnp.float32), b16.astype(jnp.float32)
@jax.jit
def mmf_scan(ab, st):
    af, bf = ab
    probe, acc = st
    def step(acc, c):
        return jax.lax.dot(af * c, bf, precision=jax.lax.Precision.HIGHEST) + acc * 1e-8, None
    acc, _ = jax.lax.scan(step, acc, jnp.arange(1.0, K + 1.0) + probe[0])
    return (acc[0, :1], acc)
t = bench_chain(mmf_scan, (af, bf), (jnp.zeros((1,)), jnp.zeros((4096, 4096), jnp.float32))) / K
print(f"f32-HIGHEST 4096^3: {t*1e3:.2f} ms -> {fl/t/1e12:.2f} TF/s", flush=True)

# small-GEMM shape of our actual workload: (B=4096, P=1920) @ (1920, 128)
bb = jax.random.normal(jax.random.key(4), (4096, 1920), jnp.float32)
rr = jax.random.normal(jax.random.key(5), (1920, 128), jnp.float32)
fl2 = 2 * 4096 * 1920 * 128
@jax.jit
def skinny_scan(ab, st):
    bbx, rrx = ab
    probe, acc = st
    def step(acc, c):
        return jax.lax.dot(bbx * c, rrx, precision=jax.lax.Precision.HIGHEST) + acc * 1e-8, None
    acc, _ = jax.lax.scan(step, acc, jnp.arange(1.0, K + 1.0) + probe[0])
    return (acc[0, :1], acc)
t = bench_chain(skinny_scan, (bb, rr), (jnp.zeros((1,)), jnp.zeros((4096, 128), jnp.float32))) / K
print(f"f32-HIGHEST (4096x1920)@(1920x128): {t*1e3:.3f} ms -> {fl2/t/1e12:.2f} TF/s "
      f"(reads {4096*1920*4/1e6:.0f} MB -> {4096*1920*4/1e9/t:.0f} GB/s)", flush=True)
