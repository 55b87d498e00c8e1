"""Adam optimizer with reference-compatible semantics, as pure functions.

The reference hand-rolls Adam over a dict of tensors
(``/root/reference/QFA/optimizer.py``) with three quirks that matter for
training-dynamics parity and are preserved here behind explicit knobs:

* L2 weight decay is folded into the gradient *before* the moment updates
  (classic Adam-with-L2, not AdamW), applied to **all** parameters including
  the physical scalars.
* The bias-correction/schedule counter ``i`` advances once per **epoch**
  (``optimizer.step()`` is called outside the batch loop,
  ``/root/reference/QFA/model.py:214-215``), not per batch — so every batch
  in an epoch shares one bias-correction factor and learning rate. Expressed
  here by keeping ``epoch`` in the state and advancing it via
  :func:`next_epoch`.
* The step-decay schedule is ``lr0 * alpha ** ((i + 1) // step)``
  (``/root/reference/QFA/optimizer.py:79-99``).

Everything is a pytree-to-pytree pure function, safe inside ``jit`` and
``shard_map``; an optax-style wrapper is provided for interop.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

Array = jnp.ndarray
PyTree = Any

__all__ = [
    "AdamConfig",
    "AdamState",
    "step_schedule",
    "constant_schedule",
    "init",
    "apply_update",
    "next_epoch",
    "as_optax",
]


class AdamConfig(NamedTuple):
    """Hyper-parameters (hashable; safe as a jit static argument)."""

    learning_rate: float = 1e-2
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 1e-3
    decay_alpha: float = 1.0  #: step-decay factor (1.0 = constant LR)
    decay_step: int = 10  #: epochs per decay step


class AdamState(NamedTuple):
    """Optimizer state pytree."""

    m: PyTree  #: first-moment estimates, shaped like the params.
    v: PyTree  #: second-moment estimates.
    epoch: Array  #: int32 scalar — the reference's per-epoch counter ``i``.


def step_schedule(alpha: float, step: int) -> Callable[[Array, float], Array]:
    """``lr(i) = lr0 * alpha ** ((i + 1) // step)`` (reference semantics)."""

    def schedule(i: Array, lr0: float) -> Array:
        return lr0 * alpha ** ((i + 1) // step)

    return schedule


def constant_schedule(i: Array, lr0: float) -> Array:
    return jnp.asarray(lr0)


def init(params: PyTree) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(
        m=zeros,
        v=jax.tree.map(jnp.zeros_like, params),
        epoch=jnp.asarray(0, jnp.int32),
    )


def scheduled_lr(config: AdamConfig, epoch: Array) -> Array:
    return config.learning_rate * config.decay_alpha ** ((epoch + 1) // config.decay_step)


def apply_update(
    params: PyTree, grads: PyTree, state: AdamState, config: AdamConfig
) -> tuple[PyTree, AdamState]:
    """One batch update. Returns (new_params, new_state).

    Bias correction uses ``epoch + 1`` with the epoch frozen across the whole
    epoch, matching the reference exactly.
    """
    wd = config.weight_decay
    g = jax.tree.map(lambda gi, pi: gi + wd * pi, grads, params)
    m = jax.tree.map(lambda gi, mi: (1 - config.b1) * gi + config.b1 * mi, g, state.m)
    v = jax.tree.map(
        lambda gi, vi: (1 - config.b2) * gi * gi + config.b2 * vi, g, state.v
    )
    t = (state.epoch + 1).astype(jnp.float32)
    bc1 = 1.0 - config.b1**t
    bc2 = 1.0 - config.b2**t
    lr = scheduled_lr(config, state.epoch)
    new_params = jax.tree.map(
        lambda pi, mi, vi: pi - lr * (mi / bc1) / (jnp.sqrt(vi / bc2) + config.eps),
        params,
        m,
        v,
    )
    return new_params, AdamState(m=m, v=v, epoch=state.epoch)


def next_epoch(state: AdamState) -> AdamState:
    """Advance the per-epoch counter (the reference's ``optimizer.step()``)."""
    return state._replace(epoch=state.epoch + 1)


def as_optax(config: AdamConfig) -> optax.GradientTransformation:
    """Expose the reference-semantics Adam as an optax transformation.

    The epoch counter must still be advanced externally via the returned
    state's ``epoch`` field (optax has no per-epoch hook); for standard
    per-step Adam just use ``optax.adamw`` instead.
    """

    def init_fn(params):
        return init(params)

    def update_fn(grads, state, params=None):
        if params is None:
            raise ValueError("reference Adam requires params (weight decay)")
        new_params, new_state = apply_update(params, grads, state, config)
        updates = jax.tree.map(lambda n, p: n - p, new_params, params)
        return updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)
