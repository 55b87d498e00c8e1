import time
import jax, jax.numpy as jnp

n, p = 65536, 1913
x = jnp.ones((n, p), jnp.float32)  # 502 MB
jax.block_until_ready(x)

def timeit(fn, *a, iters=5):
    o = fn(*a); jax.block_until_ready(o)
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter(); o = fn(*a); jax.block_until_ready(o)
        best = min(best, time.perf_counter() - t0)
    return best

read = jax.jit(lambda x: jnp.sum(x, axis=0))           # read 502MB, write 8KB
copy = jax.jit(lambda x: x + 1.0)                      # read+write 1004MB
t_read = timeit(read, x)
t_copy = timeit(copy, x)
gb = n * p * 4 / 1e9
print(f"read  {gb:.2f} GB in {t_read*1e3:.1f} ms -> {gb/t_read:.1f} GB/s")
print(f"copy  {2*gb:.2f} GB in {t_copy*1e3:.1f} ms -> {2*gb/t_copy:.1f} GB/s")

# gather cost: random row gather of the full dataset
idx = jax.random.permutation(jax.random.key(0), n)
gat = jax.jit(lambda x, i: x[i])
t_gat = timeit(gat, x, idx)
print(f"gather {2*gb:.2f} GB in {t_gat*1e3:.1f} ms -> {2*gb/t_gat:.1f} GB/s")

# matmul calibration for MFU
a = jnp.ones((4096, 4096), jnp.bfloat16); b = jnp.ones((4096, 4096), jnp.bfloat16)
mm = jax.jit(lambda a, b: a @ b)
t_mm = timeit(mm, a, b)
fl = 2 * 4096**3
print(f"bf16 4096^3 matmul: {t_mm*1e3:.2f} ms -> {fl/t_mm/1e12:.1f} TF/s")
af = jnp.ones((4096, 4096), jnp.float32)
mmf = jax.jit(lambda a, b: jax.lax.dot(a, b, precision=jax.lax.Precision.HIGHEST))
t_mmf = timeit(mmf, af, af)
print(f"f32-HIGHEST 4096^3 matmul: {t_mmf*1e3:.2f} ms -> {fl/t_mmf/1e12:.1f} TF/s")
