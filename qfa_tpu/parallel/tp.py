"""2-D mesh parallelism: batch x wavelength (data x pix) sharding.

For DESI-scale grids (Npix ~ 9k+) or very large batches, the wavelength
axis itself can be sharded: every per-spectrum contraction
(``K = F^T diag(w) F``, ``w = F^T u``, the quad/logdet reductions) contracts
over pixels, so a pixel-sharded layout turns them into partial contractions
plus one ``psum`` over the ``pix`` axis — exactly what GSPMD inserts when
the inputs carry these shardings:

    batch arrays (B, Npix)   -> P('data', 'pix')
    F (Npix, Nh), Psi (Npix) -> P('pix', ...)
    omega (Nb), scalars      -> replicated (tiny; the blue/red split does
                                not align with pixel shards)

This module builds the mesh/shardings and a jit training step with those
constraints; XLA partitions the same model code used everywhere else (no
separate 2-D implementation to maintain).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.batch import SpectraBatch
from ..models.params import QFAParams, clip_params
from ..models.qfa import loss_and_grads
from ..train import adam
from ..train.loop import TrainConfig, TrainState, guard_nonfinite

__all__ = ["make_mesh_2d", "shard_params_2d", "shard_batch_2d", "make_tp_step_fn"]


def make_mesh_2d(
    n_data: int, n_pix: int, devices=None
) -> Mesh:
    """A (data, pix) mesh over ``n_data * n_pix`` devices."""
    devs = list(devices) if devices is not None else jax.devices()
    need = n_data * n_pix
    if need > len(devs):
        raise ValueError(f"need {need} devices, have {len(devs)}")
    arr = np.array(devs[:need]).reshape(n_data, n_pix)
    return Mesh(arr, ("data", "pix"))


def _check_pix_divisible(npix: int, mesh: Mesh) -> None:
    n_pix = mesh.shape["pix"]
    if npix % n_pix:
        raise ValueError(
            f"Npix={npix} must be divisible by the 'pix' mesh axis ({n_pix}); "
            "pad the wavelength grid (masked pixels are free) or pick a "
            "compatible mesh shape"
        )


def shard_params_2d(params: QFAParams, mesh: Mesh) -> QFAParams:
    """Place parameters: F/Psi sharded over pixels, the rest replicated."""
    _check_pix_divisible(params.F.shape[0], mesh)

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return QFAParams(
        F=put(params.F, P("pix", None)),
        Psi=put(params.Psi, P("pix")),
        omega=put(params.omega, P()),
        tau0=put(params.tau0, P()),
        c0=put(params.c0, P()),
        beta=put(params.beta, P()),
    )


def shard_batch_2d(batch: SpectraBatch, mesh: Mesh) -> SpectraBatch:
    """Place a batch: spectra over 'data', pixels over 'pix'.

    ``zabs`` (blue pixels only, length Nb) is sharded over 'data' only —
    its length rarely aligns with pixel shards.
    """
    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return SpectraBatch(
        delta=put(batch.delta, P("data", "pix")),
        error=put(batch.error, P("data", "pix")),
        zabs=put(batch.zabs, P("data", None)),
        mask=put(batch.mask, P("data", "pix")),
        weight=put(batch.weight, P("data")),
    )


def make_tp_step_fn(config: TrainConfig, mesh: Mesh) -> Callable:
    """Jit training step with 2-D sharding constraints.

    Signature ``(state, batch) -> (state, loss)``; feed it states prepared
    with :func:`shard_params_2d` (optimizer moments inherit the parameter
    shardings) and batches from :func:`shard_batch_2d`. GSPMD inserts the
    pixel-axis partial-contraction psums and the data-axis gradient
    reductions automatically.
    """
    adam_cfg = config.adam_config()

    param_specs = QFAParams(
        F=P("pix", None), Psi=P("pix"), omega=P(), tau0=P(), c0=P(), beta=P()
    )
    state_shardings = TrainState(
        params=jax.tree.map(lambda s: NamedSharding(mesh, s), param_specs),
        opt_state=adam.AdamState(
            m=jax.tree.map(lambda s: NamedSharding(mesh, s), param_specs),
            v=jax.tree.map(lambda s: NamedSharding(mesh, s), param_specs),
            epoch=NamedSharding(mesh, P()),
        ),
    )
    batch_shardings = SpectraBatch(
        delta=NamedSharding(mesh, P("data", "pix")),
        error=NamedSharding(mesh, P("data", "pix")),
        zabs=NamedSharding(mesh, P("data", None)),
        mask=NamedSharding(mesh, P("data", "pix")),
        weight=NamedSharding(mesh, P("data")),
    )

    def step(state: TrainState, batch: SpectraBatch):
        loss, grads = loss_and_grads(
            state.params, batch, config.options,
            reference_norm=config.reference_norm,
        )
        new_params, new_opt = adam.apply_update(
            state.params, grads, state.opt_state, adam_cfg
        )
        new_params = clip_params(new_params, config.bounds)
        new_state = TrainState(new_params, new_opt)
        if config.reject_nonfinite:
            new_state, _ = guard_nonfinite(new_state, state, loss)
        return new_state, loss

    return jax.jit(
        step,
        in_shardings=(state_shardings, batch_shardings),
        out_shardings=(state_shardings, NamedSharding(mesh, P())),
        donate_argnums=(0,),
    )
