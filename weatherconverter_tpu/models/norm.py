"""BatchNorm momentum control.

The reference sets BN momentum globally after model construction with
`set_bn_momentum(model.backbone, momentum=0.01)` (reference:
seg_model/utils/utils.py:31-34, called at train.py:285). The flax analog is
this process-level knob read by the factory-built seg models' BatchNorms at
trace time; `make_seg_model(bn_momentum=...)` PINS it on every call (to its
arg, or back to the torch default 0.1) so one model's momentum cannot leak
into the next model built — a leaked 0.01 changed a later run's trained
weights (round-4 order-dependent test flake). Residual edge (accepted):
momentum is baked at TRACE time, so constructing seg model B before model
A's first train-mode apply re-pins the knob; momentum is irrelevant in eval
mode (use_running_average), and no in-repo flow interleaves two train-mode
seg models.

Conventions: torch `momentum` m means new = (1-m)*old + m*batch;
flax `momentum` f means new = f*old + (1-f)*batch, so f = 1 - m.
"""

from __future__ import annotations

from flax import linen as nn

_FLAX_MOMENTUM = 0.9  # = torch momentum 0.1 (both frameworks' default)


def set_bn_momentum(torch_momentum: float) -> None:
    """Set the torch-convention BN momentum used by subsequently TRACED
    models (momentum is baked at trace time; re-jit after changing)."""
    global _FLAX_MOMENTUM
    _FLAX_MOMENTUM = 1.0 - torch_momentum


def bn_momentum() -> float:
    return _FLAX_MOMENTUM


def batch_norm(train: bool, name: str = "bn") -> nn.BatchNorm:
    return nn.BatchNorm(
        use_running_average=not train, momentum=bn_momentum(), name=name
    )
