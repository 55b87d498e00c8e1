import time
import jax, jax.numpy as jnp

n, p = 65536, 1913
x = jax.random.normal(jax.random.key(0), (n, p), jnp.float32)
jax.block_until_ready(x)
gb = n * p * 4 / 1e9
K = 16  # iterations inside one jit

# read-bound: scan accumulating x * c_i (reads x each step; c varies)
@jax.jit
def read_scan(x, cs):
    def step(acc, c):
        return acc + jnp.sum(x * c, axis=0), None
    acc, _ = jax.lax.scan(step, jnp.zeros((p,), jnp.float32), cs)
    return acc

cs = jnp.arange(1.0, K + 1.0)
def timeit(fn, *a, iters=3):
    o = fn(*a); jax.block_until_ready(o)
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter(); o = fn(*a); jax.block_until_ready(o)
        best = min(best, time.perf_counter() - t0)
    return best

t = timeit(read_scan, x, cs) / K
print(f"in-jit read: {t*1e3:.2f} ms/pass -> {gb/t:.1f} GB/s")

# copy-bound: y_{i+1} = y_i * c (read+write full array each step)
@jax.jit
def copy_scan(x, cs):
    def step(y, c):
        return y * c, None
    y, _ = jax.lax.scan(step, x, cs)
    return y

t = timeit(copy_scan, x, cs) / K
print(f"in-jit copy: {t*1e3:.2f} ms/pass -> {2*gb/t:.1f} GB/s")

# gather: different permutation each step (data-dependent)
@jax.jit
def gather_scan(x, keys):
    def step(acc, k):
        idx = jax.random.permutation(jax.random.key_data(k)[0], n)  # cheap? no...
        return acc, None
    return None

# simpler: gather with per-step offset-rolled fixed perm
idx0 = jax.random.permutation(jax.random.key(1), n)
@jax.jit
def gather_scan2(x, idx0, offs):
    def step(acc, o):
        idx = (idx0 + o) % n
        g = x[idx]
        return acc + g[0], None
    acc, _ = jax.lax.scan(step, jnp.zeros((p,), jnp.float32), offs)
    return acc

offs = jnp.arange(K, dtype=jnp.int32)
t = timeit(gather_scan2, x, idx0, offs) / K
print(f"in-jit gather: {t*1e3:.2f} ms/pass -> {2*gb/t:.1f} GB/s")

# matmul in-jit: varying scale to prevent hoisting
a = jax.random.normal(jax.random.key(2), (4096, 4096), jnp.bfloat16)
b = jax.random.normal(jax.random.key(3), (4096, 4096), jnp.bfloat16)
@jax.jit
def mm_scan(a, b, cs):
    def step(acc, c):
        return acc + (a * c.astype(jnp.bfloat16)) @ b, None
    acc, _ = jax.lax.scan(step, jnp.zeros_like(a), cs)
    return acc
t = timeit(mm_scan, a, b, cs) / K
fl = 2 * 4096**3
print(f"in-jit bf16 4096^3: {t*1e3:.2f} ms -> {fl/t/1e12:.2f} TF/s")

af, bf = a.astype(jnp.float32), b.astype(jnp.float32)
@jax.jit
def mmf_scan(a, b, cs):
    def step(acc, c):
        return acc + jax.lax.dot(a * c, b, precision=jax.lax.Precision.HIGHEST), None
    acc, _ = jax.lax.scan(step, jnp.zeros_like(a), cs)
    return acc
t = timeit(mmf_scan, af, bf, cs) / K
print(f"in-jit f32-HIGHEST 4096^3: {t*1e3:.2f} ms -> {fl/t/1e12:.2f} TF/s")
