"""Checkpointing: reference-schema npz plus full training-state snapshots.

Two levels:

* **Interop checkpoints** — ``models.params.save_npz/load_npz`` write the
  reference's flat schema (``mu, F, Psi, omega, tau0, c0, beta``), readable
  by the upstream artifacts and notebooks.
* **Full training state** (this module) — parameters AND optimizer moments
  AND the epoch counter, so resume continues the exact trajectory. The
  reference cannot do this (its resume is a no-op and Adam moments reset,
  SURVEY.md section 3 bug 4 / section 5).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..models.params import QFAParams
from . import adam
from .loop import TrainState

__all__ = ["save_state", "load_state", "latest_checkpoint"]

_PARAM_KEYS = ("F", "Psi", "omega", "tau0", "c0", "beta")


def save_state(path: str, state: TrainState, mu) -> None:
    """Write a full-state npz: params, Adam m/v, epoch counter, mu."""
    directory = os.path.dirname(path)
    if directory:
        os.makedirs(directory, exist_ok=True)
    arrays = {"mu": np.asarray(mu, np.float32),
              "epoch": np.asarray(state.opt_state.epoch)}
    for k in _PARAM_KEYS:
        arrays[k] = np.asarray(getattr(state.params, k), np.float32)
        arrays[f"m_{k}"] = np.asarray(getattr(state.opt_state.m, k), np.float32)
        arrays[f"v_{k}"] = np.asarray(getattr(state.opt_state.v, k), np.float32)
    np.savez(path, **arrays)


def load_state(path: str, dtype=jnp.float32) -> tuple[TrainState, jnp.ndarray]:
    """Load a full-state npz; returns (TrainState, mu)."""
    with np.load(path) as f:
        params = QFAParams(**{k: jnp.asarray(f[k], dtype) for k in _PARAM_KEYS})
        m = QFAParams(**{k: jnp.asarray(f[f"m_{k}"], dtype) for k in _PARAM_KEYS})
        v = QFAParams(**{k: jnp.asarray(f[f"v_{k}"], dtype) for k in _PARAM_KEYS})
        epoch = jnp.asarray(f["epoch"], jnp.int32)
        mu = jnp.asarray(f["mu"], dtype)
    return TrainState(params, adam.AdamState(m=m, v=v, epoch=epoch)), mu


def latest_checkpoint(directory: str, prefix: str = "state_epoch_") -> str | None:
    """Newest full-state checkpoint in a directory (by epoch number)."""
    if not os.path.isdir(directory):
        return None
    best, best_epoch = None, -1
    for name in os.listdir(directory):
        if name.startswith(prefix) and name.endswith(".npz"):
            try:
                epoch = int(name[len(prefix):-4])
            except ValueError:
                continue
            if epoch > best_epoch:
                best, best_epoch = os.path.join(directory, name), epoch
    return best
