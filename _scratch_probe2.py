"""Probe pieces: (a) VMEM ref scalar load -> SMEM, (b) (1,1) bcast pow,
(c) MXU (1,P)@(P,1) lane-sum. Runs interpret + TPU."""
import functools
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P, TB = 256, 8

def kernel(x_ref, ones_ref, o_ref, smem, vmem):
    step = pl.program_id(0)
    @pl.when(step == 0)
    def _():
        vmem[...] = jnp.zeros_like(vmem)
        smem[0, 0] = 2.0

    x = x_ref[...]
    # (b) broadcast a (1,1) vector value into (TB,P) math
    beta11 = vmem[0:1, 1:2] + 1.5
    y = (1.0 + x) ** beta11
    # (c) lane sum via MXU -> (1,1)
    row = jnp.sum(y, axis=0, keepdims=True)            # (1,P)
    tot = jax.lax.dot_general(row, ones_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    vmem[0:1, 0:1] += tot
    # (a) scalar load from VMEM ref -> SMEM scalar math
    @pl.when(step == 1)
    def _():
        g = vmem[0, 0]
        smem[0, 1] = smem[0, 0] * 3.0 + g
        o_ref[0:1, 0:1] = smem[0, 1] * jnp.ones((1, 1), jnp.float32)
        o_ref[0:1, 1:2] = vmem[0:1, 0:1]

def run(interpret):
    x = jnp.full((2 * TB, P), 0.5, jnp.float32)
    ones = jnp.ones((P, 1), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(2,),
        in_specs=[pl.BlockSpec((TB, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((P, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1, 8), jnp.float32),
                        pltpu.VMEM((1, 128), jnp.float32)],
        interpret=interpret,
    )(x, ones)
    expect_tot = 2 * TB * P * 1.5 ** 1.5
    print(f"interpret={interpret}: o[0,0]={float(out[0,0]):.2f} "
          f"(expect {6.0 + expect_tot:.2f})  o[0,1]={float(out[0,1]):.2f} "
          f"(expect {expect_tot:.2f})", flush=True)

run(True)
run(False)
