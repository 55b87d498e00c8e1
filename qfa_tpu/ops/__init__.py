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
from .validate import (
    max_tile_batch,
    validate_epoch_kernel,
    validate_predict_kernel,
    validate_step_kernel,
    validate_tile,
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
    "max_tile_batch",
    "validate_epoch_kernel",
    "validate_predict_kernel",
    "validate_step_kernel",
    "validate_tile",
]
