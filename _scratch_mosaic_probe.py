"""Probe Mosaic lowering capabilities needed for the epoch mega-kernel."""
import functools, time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 256
TB = 8

def kernel(x_ref, o_ref, scal_scr, vec_scr):
    step = pl.program_id(0)
    @pl.when(step == 0)
    def _init():
        vec_scr[...] = jnp.zeros_like(vec_scr)
        scal_scr[0, 0] = 0.25

    x = x_ref[...]
    # (1,1) slice of a VMEM scratch row, broadcast into (TB, P) math
    beta = vec_scr[0:1, 0:1] + 1.5              # (1,1)
    y = (1.0 + x) ** beta                        # (TB,P) ** (1,1) broadcast
    # accumulate a lane-sum via MXU into a (1,1)
    ones_col = jnp.ones((P, 1), jnp.float32)
    row = jnp.sum(y, axis=0, keepdims=True)      # (1, P) sublane reduce
    tot = jax.lax.dot_general(row, ones_col, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # (1,1)
    vec_scr[0:1, 0:1] += tot
    # SMEM scalar read/write roundtrip
    s = scal_scr[0, 0]
    scal_scr[0, 0] = s + 1.0
    @pl.when(step == 1)
    def _fin():
        o_ref[...] = vec_scr[...] + scal_scr[0, 0]

x = jnp.ones((2 * TB, P), jnp.float32) * 0.5
out = pl.pallas_call(
    kernel,
    grid=(2,),
    in_specs=[pl.BlockSpec((TB, P), lambda i: (i, 0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
    scratch_shapes=[pltpu.SMEM((1, 8), jnp.float32),
                    pltpu.VMEM((1, 128), jnp.float32)],
)(x)
jax.block_until_ready(out)
expect = 2 * TB * P * 1.5 ** 1.75 + 2.25
print("mega-kernel probe ok:", float(out[0, 0]), "expect", expect)
