"""Optimizers and LR schedules (optax).

Parity targets:
  - Adam(lr=1e-4) for DDPM training (reference: diffusion_model/train_ddpm.py:190).
  - SGD(momentum, weight_decay) with the backbone param group at a lower lr
    than the head (reference: seg_model/train.py:333-344 builds two param
    groups: backbone at 0.1x lr, classifier at lr).
  - PolyLR stepped PER BATCH: lr * (1 - iter/max_iters)^power with a min-lr
    floor (reference: seg_model/utils/scheduler.py:3-12; stepped per batch at
    train.py:234).
  - StepLR alternative (reference: seg_model/train.py:351-353).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax


def poly_lr(base_lr: float, max_iters: int, power: float = 0.9, min_lr: float = 1e-6):
    """(reference: seg_model/utils/scheduler.py:10-12):
    lr = max(base * (1 - cur/max)^power, min_lr)."""

    def schedule(count):
        import jax.numpy as jnp

        frac = 1.0 - jnp.minimum(count, max_iters) / max_iters
        return jnp.maximum(base_lr * frac**power, min_lr)

    return schedule


def step_lr(base_lr: float, step_size: int, gamma: float = 0.1):
    """torch.optim.lr_scheduler.StepLR semantics (reference: train.py:351-353)."""

    def schedule(count):
        import jax.numpy as jnp

        return base_lr * gamma ** (count // step_size)

    return schedule


def make_schedule(
    sched_type: str, base_lr: float, max_iters: int, params: dict | None = None
):
    params = dict(params or {})
    if sched_type == "PolyLR":
        return poly_lr(
            base_lr, max_iters, params.get("power", 0.9), params.get("min_lr", 1e-6)
        )
    if sched_type == "StepLR":
        return step_lr(base_lr, params.get("step_size", 10), params.get("gamma", 0.1))
    if sched_type in ("constant", "none"):
        return base_lr
    raise ValueError(f"unknown scheduler type {sched_type!r}")


def sgd(
    learning_rate: Any, momentum: float = 0.9, weight_decay: float = 1e-4
) -> optax.GradientTransformation:
    """SGD+momentum+decoupled-into-grad weight decay, matching
    torch.optim.SGD's coupled weight decay (grad += wd * param)
    (reference: seg_model/train.py:333-344)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(learning_rate=learning_rate, momentum=momentum),
    )


def adam(learning_rate: Any = 1e-4) -> optax.GradientTransformation:
    """torch.optim.Adam defaults (reference: train_ddpm.py:190)."""
    return optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)


def layerwise_sgd(
    params_tree,
    schedules: dict[str, Any],
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    default_label: str = "head",
) -> optax.GradientTransformation:
    """Per-top-level-module learning rates — the reference's two param groups
    (reference: seg_model/train.py:333-344; config optimizer.layerwise_lr maps
    backbone -> 1e-5, classifier -> 1e-4).

    `schedules` maps label -> learning rate (float or schedule); params whose
    top-level key is not in `schedules` use `default_label`'s rate.
    """

    def label_of(path_key: str) -> str:
        return path_key if path_key in schedules else default_label

    labels = {k: label_of(k) for k in params_tree.keys()}

    transforms = {
        name: sgd(lr, momentum=momentum, weight_decay=weight_decay)
        for name, lr in schedules.items()
    }
    return optax.multi_transform(transforms, labels)


def make_seg_optimizer(
    params_tree,
    opt_cfg,
    max_iters: int,
    sched_type: str = "PolyLR",
    sched_params: dict | None = None,
) -> optax.GradientTransformation:
    """Assemble the reference seg optimizer: SGD param groups (backbone at its
    own lr) each under the PolyLR-per-step schedule
    (reference: seg_model/train.py:333-353)."""
    p = dict(opt_cfg.params)
    momentum = p.get("momentum", 0.9)
    wd = p.get("weight_decay", 1e-4)
    lw = dict(opt_cfg.layerwise_lr)
    head_lr = lw.get("classifier", p.get("lr", 1e-4))
    backbone_lr = lw.get("backbone", head_lr * 0.1)
    schedules = {
        "backbone": make_schedule(sched_type, backbone_lr, max_iters, sched_params),
        "head": make_schedule(sched_type, head_lr, max_iters, sched_params),
    }
    return layerwise_sgd(params_tree, schedules, momentum=momentum, weight_decay=wd)


def global_norm(tree) -> jax.Array:
    return optax.global_norm(tree)
