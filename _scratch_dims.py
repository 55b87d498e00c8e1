"""Probe Mosaic dot_general dimension-number support."""
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TB, P, RC = 64, 256, 128

def kernel(x_ref, rt_ref, s_ref, o1_ref, o2_ref):
    x = x_ref[...]        # (TB, P)
    rt = rt_ref[...]      # (RC, P)
    s = s_ref[...]        # (TB, RC)
    # contraction over dim1 x dim1: x @ rt.T -> (TB, RC)
    o1_ref[...] = jax.lax.dot_general(
        x, rt, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    # contraction over dim0 x dim0: s.T @ x -> (RC, P)
    o2_ref[...] = jax.lax.dot_general(
        s, x, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)

x = jax.random.normal(jax.random.key(0), (TB, P))
rt = jax.random.normal(jax.random.key(1), (RC, P))
s = jax.random.normal(jax.random.key(2), (TB, RC))
o1, o2 = pl.pallas_call(
    kernel,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
    out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_shape=[jax.ShapeDtypeStruct((TB, RC), jnp.float32),
               jax.ShapeDtypeStruct((RC, P), jnp.float32)],
)(x, rt, s)
np.testing.assert_allclose(np.asarray(o1), np.asarray(x) @ np.asarray(rt).T, atol=1e-4)
np.testing.assert_allclose(np.asarray(o2), np.asarray(s).T @ np.asarray(x), atol=1e-4)
print("dimension-number dots OK on TPU")
