import time
import jax, jax.numpy as jnp
import numpy as np

n, p = 65536, 1913
x = jax.random.normal(jax.random.key(0), (n, p), jnp.float32)
_ = np.asarray(x[0])
gb = n * p * 4 / 1e9
K = 16

def bench_chain(fn, x, state0, trials=3):
    s = fn(x, state0)
    float(np.asarray(jax.tree.leaves(s)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(trials):
        s = fn(x, s)
    float(np.asarray(jax.tree.leaves(s)[0]).ravel()[0])
    return (time.perf_counter() - t0) / trials

@jax.jit
def read_scan(x, acc):
    def step(a, c):
        return a + jnp.sum(x * (c + a[0] * 1e-20), axis=0), None
    a, _ = jax.lax.scan(step, acc, jnp.arange(1.0, K + 1.0)); return a
t = bench_chain(read_scan, x, jnp.zeros((p,), jnp.float32)) / K
print(f"read: {t*1e3:.2f} ms/pass -> {gb/t:.1f} GB/s", flush=True)

@jax.jit
def copy_scan(x, y):
    def step(y, c):
        return y * (1.0 + 1e-9 * c), None
    y, _ = jax.lax.scan(step, y, jnp.arange(K, dtype=jnp.float32)); return y
t = bench_chain(copy_scan, x, x + 0.0) / K
print(f"copy: {t*1e3:.2f} ms/pass -> {2*gb/t:.1f} GB/s", flush=True)

idx0 = jax.random.permutation(jax.random.key(1), n)
@jax.jit
def gather_scan(xi, acc):
    x, idx0 = xi
    def step(a, o):
        g = x[(idx0 + o + a[0].astype(jnp.int32) % 3) % n]
        return a + g[0], None
    a, _ = jax.lax.scan(step, acc, jnp.arange(K, dtype=jnp.int32)); return a
t = bench_chain(gather_scan, (x, idx0), jnp.zeros((p,), jnp.float32)) / K
print(f"gather: {t*1e3:.2f} ms/pass -> {2*gb/t:.1f} GB/s", flush=True)

a16 = jax.random.normal(jax.random.key(2), (4096, 4096), jnp.bfloat16)
b16 = jax.random.normal(jax.random.key(3), (4096, 4096), jnp.bfloat16)
fl = 2 * 4096**3
@jax.jit
def mm_scan(ab, acc):
    a16, b16 = ab
    def step(acc, c):
        return acc + (a16 + acc * 0) @ (b16 * c.astype(jnp.bfloat16)), None
    acc, _ = jax.lax.scan(step, acc, jnp.arange(1.0, K + 1.0)); return acc
t = bench_chain(mm_scan, (a16, b16), jnp.zeros((4096, 4096), jnp.bfloat16)) / K
print(f"bf16 4096^3: {t*1e3:.2f} ms -> {fl/t/1e12:.2f} TF/s", flush=True)

af, bf = a16.astype(jnp.float32), b16.astype(jnp.float32)
@jax.jit
def mmf_scan(ab, acc):
    af, bf = ab
    def step(acc, c):
        return acc + jax.lax.dot(af + acc * 0, bf * c,
                                 precision=jax.lax.Precision.HIGHEST), None
    acc, _ = jax.lax.scan(step, acc, jnp.arange(1.0, K + 1.0)); return acc
t = bench_chain(mmf_scan, (af, bf), jnp.zeros((4096, 4096), jnp.float32)) / K
print(f"f32-HIGHEST 4096^3: {t*1e3:.2f} ms -> {fl/t/1e12:.2f} TF/s", flush=True)
