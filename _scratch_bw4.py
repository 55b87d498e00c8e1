import time
import jax, jax.numpy as jnp

n, p = 65536, 1913
x = jax.random.normal(jax.random.key(0), (n, p), jnp.float32)
jax.block_until_ready(x)
gb = n * p * 4 / 1e9
K = 16

def bench(fn, make_args, trials=4):
    """Each trial gets FRESH args (tunnel memoizes identical executions)."""
    o = fn(*make_args(0)); jax.block_until_ready(o)
    best = 1e9
    for t in range(1, trials + 1):
        args = make_args(t)
        jax.block_until_ready(args)
        t0 = time.perf_counter(); o = fn(*args); jax.block_until_ready(o)
        best = min(best, time.perf_counter() - t0)
    return best

@jax.jit
def read_scan(x, cs):
    def step(acc, c):
        return acc + jnp.sum(x * c, axis=0), None
    acc, _ = jax.lax.scan(step, jnp.zeros((p,), jnp.float32), cs)
    return acc

t = bench(read_scan, lambda i: (x, jnp.arange(1.0, K + 1.0) + i)) / K
print(f"in-jit read: {t*1e3:.2f} ms/pass -> {gb/t:.1f} GB/s")

@jax.jit
def copy_scan(x, cs):
    def step(y, c):
        return y * c, None
    y, _ = jax.lax.scan(step, x, cs)
    return y
t = bench(copy_scan, lambda i: (x * (1 + 1e-6 * i), jnp.full((K,), 1.0 + 1e-7))) / K
print(f"in-jit copy: {t*1e3:.2f} ms/pass -> {2*gb/t:.1f} GB/s")

idx0 = jax.random.permutation(jax.random.key(1), n)
@jax.jit
def gather_scan(x, idx0, offs):
    def step(acc, o):
        g = x[(idx0 + o) % n]
        return acc + g[0], None
    acc, _ = jax.lax.scan(step, jnp.zeros((p,), jnp.float32), offs)
    return acc
t = bench(gather_scan, lambda i: (x, idx0, jnp.arange(K, dtype=jnp.int32) + i)) / K
print(f"in-jit gather(read+write+read-head): {t*1e3:.2f} ms/pass -> {2*gb/t:.1f} GB/s")

a = jax.random.normal(jax.random.key(2), (4096, 4096), jnp.bfloat16)
b = jax.random.normal(jax.random.key(3), (4096, 4096), jnp.bfloat16)
@jax.jit
def mm_scan(a, b, cs):
    def step(acc, c):
        return acc + (a * c.astype(jnp.bfloat16)) @ b, None
    acc, _ = jax.lax.scan(step, jnp.zeros_like(a), cs)
    return acc
fl = 2 * 4096**3
t = bench(mm_scan, lambda i: (a, b, jnp.arange(1.0, K + 1.0) + i)) / K
print(f"in-jit bf16 4096^3: {t*1e3:.2f} ms -> {fl/t/1e12:.2f} TF/s")

af, bf = a.astype(jnp.float32), b.astype(jnp.float32)
@jax.jit
def mmf_scan(a, b, cs):
    def step(acc, c):
        return acc + jax.lax.dot(a * c, b, precision=jax.lax.Precision.HIGHEST), None
    acc, _ = jax.lax.scan(step, jnp.zeros_like(a), cs)
    return acc
t = bench(mmf_scan, lambda i: (af, bf, jnp.arange(1.0, K + 1.0) + i)) / K
print(f"in-jit f32-HIGHEST 4096^3: {t*1e3:.2f} ms -> {fl/t/1e12:.2f} TF/s")
