"""Fixed-shape batch containers for spectra.

Every spectrum lives on the full (static) wavelength grid; variable-length /
missing-pixel structure is carried entirely by ``mask``. Batches are padded to
a fixed batch size with all-masked rows (``weight = 0``) so that one compiled
program serves every step — padded rows contribute exactly zero to the
likelihood and gradients.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

Array = jnp.ndarray

__all__ = ["SpectraBatch", "pad_batch"]


class SpectraBatch(NamedTuple):
    """A batch of residual spectra ready for the likelihood.

    ``delta`` is the residual field ``flux - mu * exp(-tau_total)`` (blue) /
    ``flux - mu`` (red), as produced by the data layer
    (cf. ``/root/reference/QFA/dataloader.py:135-136``).
    """

    delta: Array  #: (B, Npix) residual flux.
    error: Array  #: (B, Npix) per-pixel noise sigma (0 where masked).
    zabs: Array  #: (B, Nb) per-pixel absorber redshifts (blue side).
    mask: Array  #: (B, Npix) 1 = observed, 0 = missing.
    weight: Array  #: (B,) 1 = real spectrum, 0 = padding row.

    @property
    def batch_size(self) -> int:
        return self.delta.shape[0]

    @property
    def npix(self) -> int:
        return self.delta.shape[-1]

    @property
    def nb(self) -> int:
        return self.zabs.shape[-1]


def pad_batch(batch: SpectraBatch, target: int) -> SpectraBatch:
    """Pad a batch with all-masked zero-weight rows up to ``target`` rows."""
    b = batch.batch_size
    if b == target:
        return batch
    if b > target:
        raise ValueError(f"batch of {b} rows cannot be padded down to {target}")
    extra = target - b

    def pad(x: Array) -> Array:
        widths = [(0, extra)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths)

    return SpectraBatch(
        delta=pad(batch.delta),
        error=pad(batch.error),
        zabs=pad(batch.zabs),
        mask=pad(batch.mask),
        weight=pad(batch.weight),
    )
