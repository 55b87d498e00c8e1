"""Custom TPU ops: fused Pallas training step."""

from .fused_step import (
    TAU_LAW_ABC,
    FusedStepOutputs,
    finish_f_gradient,
    fused_loss_grads,
)

__all__ = [
    "TAU_LAW_ABC",
    "FusedStepOutputs",
    "finish_f_gradient",
    "fused_loss_grads",
]
