import time
import jax, jax.numpy as jnp

n, p = 65536, 1913
x = jax.random.normal(jax.random.key(0), (n, p), jnp.float32)
jax.block_until_ready(x)

def timeit(fn, *a, iters=10):
    o = fn(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters, o

read = jax.jit(lambda x: jnp.sum(x, axis=0))
copy = jax.jit(lambda x: x * 1.000001)
t_read, o1 = timeit(read, x)
t_copy, o2 = timeit(copy, x)
gb = n * p * 4 / 1e9
print(f"read  {gb:.2f} GB in {t_read*1e3:.2f} ms -> {gb/t_read:.1f} GB/s  (sum={float(o1[0]):.3f})")
print(f"copy  {2*gb:.2f} GB in {t_copy*1e3:.2f} ms -> {2*gb/t_copy:.1f} GB/s")

idx = jax.random.permutation(jax.random.key(1), n)
gat = jax.jit(lambda x, i: x[i] * 1.000001)  # force materialization
t_gat, o3 = timeit(gat, x, idx)
print(f"gather+scale {2*gb:.2f} GB in {t_gat*1e3:.2f} ms -> {2*gb/t_gat:.1f} GB/s")

a = jax.random.normal(jax.random.key(2), (4096, 4096), jnp.bfloat16)
b = jax.random.normal(jax.random.key(3), (4096, 4096), jnp.bfloat16)
mm = jax.jit(lambda a, b: a @ b)
t_mm, o4 = timeit(mm, a, b)
fl = 2 * 4096**3
print(f"bf16 4096^3: {t_mm*1e3:.2f} ms -> {fl/t_mm/1e12:.2f} TF/s  ({float(o4[0,0]):.2f})")
af = a.astype(jnp.float32); bf = b.astype(jnp.float32)
mmf = jax.jit(lambda a, b: jax.lax.dot(a, b, precision=jax.lax.Precision.HIGHEST))
t_mmf, o5 = timeit(mmf, af, bf)
print(f"f32-HIGHEST 4096^3: {t_mmf*1e3:.2f} ms -> {fl/t_mmf/1e12:.2f} TF/s")
