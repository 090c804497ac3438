"""BatchNorm momentum control.

The reference sets BN momentum globally after model construction with
`set_bn_momentum(model.backbone, momentum=0.01)` (reference:
seg_model/utils/utils.py:31-34, called at train.py:285). The flax analog is
this process-level knob, read by the seg model zoo's BatchNorms at TRACE
time. It is pinned PER TRAIN-MODE TRACE by models/deeplab.DeepLabV3
(`bn_momentum=` module attribute from `make_seg_model`): backbone BNs at
the model's value, head BNs back at the torch default 0.1 — the reference's
backbone-only scoping. Two failure modes forced this design (round 4):
a leaked global changed a later quality-gate run's trained weights
(order-dependent flake), and a construction-time pin was silently undone by
the training loop building its EVAL model between the train model's
construction and first trace. Momentum is unused in eval mode
(use_running_average=True), so eval traces neither read nor perturb
anything that matters.

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
