"""Loss functions.

Parity targets:
  - eps-MSE for DDPM training (reference: diffusion_model/train_ddpm.py:91,108).
  - CrossEntropy with ignore_index=255 for segmentation
    (reference: seg_model/train.py:356-359).
  - FocalLoss (reference: seg_model/utils/loss.py:5-21): CE-based,
    focal = alpha * (1 - exp(-ce))^gamma * ce, mean-reduced.
All are pure jnp functions over NHWC logits / integer label maps, safe under
jit and grad (masked, never NaN for all-ignored batches).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IGNORE_INDEX = 255


def mse_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Mean squared error (reference: train_ddpm.py:91 `nn.MSELoss()`)."""
    return jnp.mean(jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def _per_pixel_ce(
    logits: jax.Array, labels: jax.Array, ignore_index: int = IGNORE_INDEX
) -> tuple[jax.Array, jax.Array]:
    """Per-pixel CE and validity mask. logits NHWC (..., C), labels (...,) int."""
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0).astype(jnp.int32)
    logz = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logz, safe_labels[..., None], axis=-1)[..., 0]
    return jnp.where(valid, ce, 0.0), valid


def cross_entropy_loss(
    logits: jax.Array,
    labels: jax.Array,
    ignore_index: int = IGNORE_INDEX,
    reduction: str = "mean",
) -> jax.Array:
    """CE over class-last logits with ignore mask — semantics of
    `nn.CrossEntropyLoss(ignore_index=255, reduction='mean')`
    (reference: seg_model/train.py:357): mean over NON-ignored pixels."""
    ce, valid = _per_pixel_ce(logits, labels, ignore_index)
    if reduction == "none":
        return ce
    if reduction == "sum":
        return jnp.sum(ce)
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(ce) / denom


def focal_loss(
    logits: jax.Array,
    labels: jax.Array,
    alpha: float = 1.0,
    gamma: float = 2.0,
    ignore_index: int = IGNORE_INDEX,
) -> jax.Array:
    """Focal loss exactly as the reference composes it
    (reference: seg_model/utils/loss.py:15-20): ce per-pixel (reduction
    'none'), pt = exp(-ce), focal = alpha*(1-pt)^gamma * ce, then mean.

    NOTE the reference means over ALL pixels including ignored ones (its CE
    with reduction='none' yields 0 at ignored pixels); we mean over valid
    pixels, which matches when no pixel is ignored and is the correct
    normalization otherwise.
    """
    ce, valid = _per_pixel_ce(logits, labels, ignore_index)
    pt = jnp.exp(-ce)
    focal = alpha * (1.0 - pt) ** gamma * ce
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(jnp.where(valid, focal, 0.0)) / denom


def make_seg_loss(loss_type: str, params: dict | None = None):
    """Dispatch on the config's loss section (reference: seg_model/train.py:356-359
    selects CrossEntropyLoss or FocalLoss from config.training.loss_function)."""
    params = dict(params or {})
    if loss_type in ("CrossEntropyLoss", "ce", "cross_entropy"):
        ignore = params.get("ignore_index", IGNORE_INDEX)
        red = params.get("reduction", "mean")
        return lambda logits, labels: cross_entropy_loss(logits, labels, ignore, red)
    if loss_type in ("FocalLoss", "focal"):
        alpha = params.get("alpha", 1.0)
        gamma = params.get("gamma", 2.0)
        ignore = params.get("ignore_index", IGNORE_INDEX)
        return lambda logits, labels: focal_loss(logits, labels, alpha, gamma, ignore)
    raise ValueError(f"unknown loss type {loss_type!r}")


def bce_logits(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Binary cross-entropy on probabilities-from-sigmoid outputs, used for
    adversarial SRGAN training (the reference defines the Discriminator at
    srgan_model/models.py:95-138 but never trains it; we provide the loss for
    the full GAN-training capability)."""
    pred = pred.astype(jnp.float32)
    eps = 1e-7
    pred = jnp.clip(pred, eps, 1 - eps)
    return -jnp.mean(target * jnp.log(pred) + (1 - target) * jnp.log(1 - pred))
