"""Training: reference-semantics Adam, jit-compiled epoch loop."""

from . import adam
from .loop import TrainConfig, TrainState, fit, make_epoch_fn, train_epoch

__all__ = ["adam", "TrainConfig", "TrainState", "fit", "make_epoch_fn", "train_epoch"]
