"""QFA model parameters: pytree definition, init, constraints, checkpoints.

The generative model (arXiv:2207.02788; reference
``/root/reference/QFA/model.py``) is

    continuum  C = mu + F h + noise(Psi),   h ~ N(0, I_Nh)
    observed   S = A(z) * C + forest noise(omega * zdep(z)) + pixel noise

with trainable parameters:

    F     (Npix, Nh)  factor loadings
    Psi   (Npix,)     continuum noise variance
    omega (Nb,)       forest noise amplitude (blue side only)
    tau0, c0, beta    scalars of the forest power law tau0 (1+z)^beta

``mu`` (the mean continuum) is **not** trained — it is estimated from data
(``/root/reference/QFA/model.py:204``) and stored alongside the parameters in
checkpoints.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..physics.smoothing import sliding_mean

Array = jnp.ndarray

__all__ = [
    "QFAParams",
    "ParamBounds",
    "DEFAULT_BOUNDS",
    "random_init",
    "clip_params",
    "smooth_params",
    "num_params",
    "save_npz",
    "load_npz",
]


class QFAParams(NamedTuple):
    """Trainable parameter pytree (a NamedTuple is a registered JAX pytree)."""

    F: Array  #: (Npix, Nh)
    Psi: Array  #: (Npix,)
    omega: Array  #: (Nb,)
    tau0: Array  #: scalar
    c0: Array  #: scalar
    beta: Array  #: scalar

    @property
    def npix(self) -> int:
        return self.F.shape[0]

    @property
    def nh(self) -> int:
        return self.F.shape[1]

    @property
    def nb(self) -> int:
        return self.omega.shape[0]

    def as_dict(self) -> dict:
        return dict(self._asdict())


class ParamBounds(NamedTuple):
    """Box constraints applied after every update
    (``/root/reference/QFA/model.py:233-241``)."""

    var_min: float = 1e-3  #: lower bound for omega and Psi
    var_max: float = 2.0  #: upper bound for omega and Psi
    tau0_min: float = 0.0
    tau0_max: float = 1.0
    beta_min: float = 0.1
    beta_max: float = 5.0
    c0_min: float = -5.0
    c0_max: float = 5.0


DEFAULT_BOUNDS = ParamBounds()


def random_init(
    key: jax.Array, npix: int, nb: int, nh: int, dtype=jnp.float32
) -> QFAParams:
    """Random initialization matching the reference strategy
    (``/root/reference/QFA/model.py:57-72``): F ~ U(-0.5, 0.5), Psi = omega = 1,
    tau0 = 0.02, c0 = 0.3, beta = 2.
    """
    f = jax.random.uniform(key, (npix, nh), dtype=dtype) - 0.5
    return QFAParams(
        F=f,
        Psi=jnp.ones((npix,), dtype),
        omega=jnp.ones((nb,), dtype),
        tau0=jnp.asarray(0.02, dtype),
        c0=jnp.asarray(0.3, dtype),
        beta=jnp.asarray(2.0, dtype),
    )


def clip_params(params: QFAParams, bounds: ParamBounds = DEFAULT_BOUNDS) -> QFAParams:
    """Project parameters back into their numerical-stability box."""
    return params._replace(
        Psi=jnp.clip(params.Psi, bounds.var_min, bounds.var_max),
        omega=jnp.clip(params.omega, bounds.var_min, bounds.var_max),
        tau0=jnp.clip(params.tau0, bounds.tau0_min, bounds.tau0_max),
        beta=jnp.clip(params.beta, bounds.beta_min, bounds.beta_max),
        c0=jnp.clip(params.c0, bounds.c0_min, bounds.c0_max),
    )


def smooth_params(params: QFAParams) -> QFAParams:
    """Periodic wavelength-axis smoothing of omega / Psi / F.

    Windows follow the reference (``/root/reference/QFA/model.py:243-252``):
    15 for the variances, 31 for the loadings, edge-truncated means.
    """
    return params._replace(
        omega=sliding_mean(params.omega, 15, axis=0),
        Psi=sliding_mean(params.Psi, 15, axis=0),
        F=sliding_mean(params.F, 31, axis=0),
    )


def num_params(npix: int, nb: int, nh: int) -> int:
    """Total trainable parameter count (``/root/reference/QFA/model.py:42``)."""
    return npix * nh + npix + nb + 3


def save_npz(path: str, params: QFAParams, mu: np.ndarray) -> None:
    """Write a checkpoint in the reference npz schema
    (keys ``mu, F, Psi, omega, tau0, c0, beta``;
    ``/root/reference/QFA/model.py:254-280``) — interoperable with the
    pretrained SDSS/DESI artifacts.
    """
    directory = os.path.dirname(path)
    if directory:
        os.makedirs(directory, exist_ok=True)
    np.savez(
        path,
        mu=np.asarray(mu, np.float32),
        F=np.asarray(params.F, np.float32),
        Psi=np.asarray(params.Psi, np.float32),
        omega=np.asarray(params.omega, np.float32),
        tau0=np.asarray(params.tau0, np.float32),
        c0=np.asarray(params.c0, np.float32),
        beta=np.asarray(params.beta, np.float32),
    )


def load_npz(
    path: str, *, compat_c0_bug: bool = False, dtype=jnp.float32
) -> tuple[QFAParams, Array]:
    """Load a reference-schema npz checkpoint.

    Args:
        compat_c0_bug: the reference loader assigns ``beta`` into ``c0``
            (``/root/reference/QFA/model.py:295``) and its bundled golden
            outputs were produced under that bug. Set True to reproduce them
            bit-for-bit; default False loads the file faithfully.

    Returns:
        (params, mu).
    """
    with np.load(path) as f:
        c0 = f["beta"] if compat_c0_bug else f["c0"]
        params = QFAParams(
            F=jnp.asarray(f["F"], dtype),
            Psi=jnp.asarray(f["Psi"], dtype),
            omega=jnp.asarray(f["omega"], dtype),
            tau0=jnp.asarray(f["tau0"], dtype),
            c0=jnp.asarray(c0, dtype),
            beta=jnp.asarray(f["beta"], dtype),
        )
        mu = jnp.asarray(f["mu"], dtype)
    return params, mu
