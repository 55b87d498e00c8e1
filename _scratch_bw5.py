import time
import jax, jax.numpy as jnp
import numpy as np

n, p = 65536, 1913
x = jax.random.normal(jax.random.key(0), (n, p), jnp.float32)
_ = np.asarray(x[0])  # force materialization
gb = n * p * 4 / 1e9
K = 16

def bench_chain(fn, state0, trials=3):
    """Chain state through calls; device_get forces real completion."""
    s = fn(state0)          # warmup/compile
    float(np.asarray(jax.tree.leaves(s)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(trials):
        s = fn(s)
    float(np.asarray(jax.tree.leaves(s)[0]).ravel()[0])
    return (time.perf_counter() - t0) / trials

# read: acc accumulates; x closed over; acc feeds back (data dependence)
@jax.jit
def read_scan(acc):
    def step(a, c):
        return a + jnp.sum(x * (c + a[0] * 1e-20), axis=0), None
    a, _ = jax.lax.scan(step, acc, jnp.arange(1.0, K + 1.0))
    return a
t = bench_chain(read_scan, jnp.zeros((p,), jnp.float32)) / K
print(f"read: {t*1e3:.2f} ms/pass -> {gb/t:.1f} GB/s")

# copy: y chained
@jax.jit
def copy_scan(y):
    def step(y, c):
        return y * (1.0 + 1e-9 * c), None
    y, _ = jax.lax.scan(step, y, jnp.arange(K, dtype=jnp.float32))
    return y
t = bench_chain(copy_scan, x + 0.0) / K
print(f"copy: {t*1e3:.2f} ms/pass -> {2*gb/t:.1f} GB/s")

# gather: offsets derived from carried acc (data-dependent)
idx0 = jax.random.permutation(jax.random.key(1), n)
@jax.jit
def gather_scan(acc):
    def step(a, o):
        g = x[(idx0 + o + a[0].astype(jnp.int32) % 3) % n]
        return a + g[0], None
    a, _ = jax.lax.scan(step, acc, jnp.arange(K, dtype=jnp.int32))
    return a
t = bench_chain(gather_scan, jnp.zeros((p,), jnp.float32)) / K
print(f"gather: {t*1e3:.2f} ms/pass -> {2*gb/t:.1f} GB/s")

# matmuls: acc chained through
a16 = jax.random.normal(jax.random.key(2), (4096, 4096), jnp.bfloat16)
b16 = jax.random.normal(jax.random.key(3), (4096, 4096), jnp.bfloat16)
fl = 2 * 4096**3
@jax.jit
def mm_scan(acc):
    def step(acc, c):
        return acc + (a16 + acc * 0) @ (b16 * c.astype(jnp.bfloat16)), None
    acc, _ = jax.lax.scan(step, acc, jnp.arange(1.0, K + 1.0))
    return acc
t = bench_chain(mm_scan, jnp.zeros((4096, 4096), jnp.bfloat16)) / K
print(f"bf16 4096^3: {t*1e3:.2f} ms -> {fl/t/1e12:.2f} TF/s")

af, bf = a16.astype(jnp.float32), b16.astype(jnp.float32)
@jax.jit
def mmf_scan(acc):
    def step(acc, c):
        return acc + jax.lax.dot(af + acc * 0, bf * c,
                                 precision=jax.lax.Precision.HIGHEST), None
    acc, _ = jax.lax.scan(step, acc, jnp.arange(1.0, K + 1.0))
    return acc
t = bench_chain(mmf_scan, jnp.zeros((4096, 4096), jnp.float32)) / K
print(f"f32-HIGHEST 4096^3: {t*1e3:.2f} ms -> {fl/t/1e12:.2f} TF/s")
