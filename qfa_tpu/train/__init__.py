"""Training: reference-semantics Adam, jit epoch loop, checkpoints."""

from . import adam
from .checkpoint import latest_checkpoint, load_state, save_state
from .pallas_engine import (
    fit_pallas,
    make_pallas_epoch_fn,
    pallas_train_epoch,
    pick_divisor_tile,
    pick_tile_batch,
    pick_tiling,
)
from .loop import (
    TrainConfig,
    TrainState,
    fit,
    fit_streaming,
    guard_nonfinite,
    make_epoch_fn,
    make_pallas_step_fn,
    make_sliced_epoch_fn,
    make_step_fn,
    reshuffle_dataset,
    train_epoch,
)

__all__ = [
    "adam",
    "latest_checkpoint",
    "load_state",
    "save_state",
    "TrainConfig",
    "TrainState",
    "fit",
    "fit_pallas",
    "make_pallas_epoch_fn",
    "fit_streaming",
    "pallas_train_epoch",
    "pick_tile_batch",
    "pick_divisor_tile",
    "pick_tiling",
    "guard_nonfinite",
    "make_epoch_fn",
    "make_pallas_step_fn",
    "make_sliced_epoch_fn",
    "make_step_fn",
    "reshuffle_dataset",
    "train_epoch",
]
