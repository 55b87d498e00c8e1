"""Custom TPU ops: fused Pallas training step + whole-epoch trainer kernel."""

from .epoch_kernel import (
    EpochOutputs,
    ZQ_LANES,
    fused_train_epoch,
    loglam_row,
    zq_column,
)
from .infer_kernel import FusedPredictOutputs, fused_predict
from .fused_step import (
    TAU_LAW_ABC,
    FusedStepOutputs,
    finish_f_gradient,
    fused_loss_grads,
)

__all__ = [
    "EpochOutputs",
    "ZQ_LANES",
    "fused_train_epoch",
    "loglam_row",
    "zq_column",
    "FusedPredictOutputs",
    "fused_predict",
    "TAU_LAW_ABC",
    "FusedStepOutputs",
    "finish_f_gradient",
    "fused_loss_grads",
]
