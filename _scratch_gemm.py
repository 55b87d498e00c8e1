import time
import jax, jax.numpy as jnp
import numpy as np

K = 16

def bench_chain(fn, x, state0, trials=3):
    s = fn(x, state0)
    float(np.asarray(jax.tree.leaves(s)[0]).ravel()[0])
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        s = fn(x, s)
        float(np.asarray(jax.tree.leaves(s)[0]).ravel()[0])
        times.append(time.perf_counter() - t0)
    return min(times)

M, Kdim = 4096, 1920
bb = jax.random.normal(jax.random.key(4), (M, Kdim), jnp.float32)

def make(n_cols, precision, dtype):
    rr = jax.random.normal(jax.random.key(5), (Kdim, n_cols), dtype)
    bx = bb.astype(dtype)
    @jax.jit
    def f(ab, st):
        bx, rx = ab
        probe, acc = st
        def step(acc, c):
            y = jax.lax.dot(bx * c.astype(dtype), rx, precision=precision)
            return y.astype(jnp.float32) + acc * 1e-8, None
        acc, _ = jax.lax.scan(step, acc, (jnp.arange(1.0, K + 1.0) + probe[0]))
        return (acc[0, :1], acc)
    t = bench_chain(f, (bx, rr), (jnp.zeros((1,)), jnp.zeros((M, n_cols), jnp.float32))) / K
    fl = 2 * M * Kdim * n_cols
    print(f"N={n_cols:5d} {str(dtype.__name__):9s} {str(precision):28s}: "
          f"{t*1e3:7.3f} ms  {fl/t/1e12:6.2f} TF/s", flush=True)

from jax.lax import Precision
for n_cols in (128, 512):
    for prec, dt in ((Precision.HIGHEST, jnp.float32),
                     (Precision.HIGH, jnp.float32),
                     (Precision.DEFAULT, jnp.float32),
                     (Precision.DEFAULT, jnp.bfloat16)):
        make(n_cols, prec, dt)
