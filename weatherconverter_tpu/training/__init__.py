"""Training: per-model train steps, optimizers/schedules, losses, loops."""

from weatherconverter_tpu.training.losses import (
    cross_entropy_loss,
    focal_loss,
    make_seg_loss,
    mse_loss,
)
from weatherconverter_tpu.training.optim import (
    adam,
    make_schedule,
    make_seg_optimizer,
    poly_lr,
    sgd,
    step_lr,
)

__all__ = [
    "mse_loss", "cross_entropy_loss", "focal_loss", "make_seg_loss",
    "adam", "sgd", "poly_lr", "step_lr", "make_schedule", "make_seg_optimizer",
]
