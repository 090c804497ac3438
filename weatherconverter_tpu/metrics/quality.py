"""Translation quality gates: mIoU-consistency and FID assembly.

BASELINE.md's north-star demands throughput "at FID and mIoU-consistency
parity". The reference computes neither (SURVEY.md §6); this module defines
both for the TPU pipeline:

  - **mIoU-consistency**: run the frozen segmentation model on TRANSLATED
    images and score them against the ORIGINAL ground-truth labels with the
    streaming confusion matrix (metrics/stream.py). A semantically faithful
    translation preserves layout, so seg(translated) should agree with gt to
    the same degree seg(original) does; the report carries both numbers and
    their gap.
  - **FID**: metrics/fid.py Frechet distance over pluggable features
    (InceptionV3 pool3 via models/inception.py when weights are supplied,
    or any embedding fn for relative tracking).
"""

from __future__ import annotations

from typing import Callable, Iterable

import jax
import jax.numpy as jnp

from weatherconverter_tpu.metrics.stream import (
    compute_metrics,
    confusion_update,
    init_confusion,
)


def _make_conf_step(seg_fn, num_classes: int):
    @jax.jit
    def step(c, images, gt):
        pred = jnp.argmax(seg_fn(images), axis=-1)
        return confusion_update(c, pred, gt, num_classes)

    return step


def miou_consistency(
    seg_fn: Callable[[jax.Array], jax.Array],
    batches: Iterable[tuple[jax.Array, jax.Array]],
    num_classes: int = 19,
    step=None,
) -> dict:
    """Score seg(images) against gt over an iterable of (images, gt) batches.

    `seg_fn`: (B, H, W, 3) -> (B, H, W, C) logits (already closed over
    variables). The confusion matrix accumulates on device; one (C, C)
    readback at the end. Returns the reference-keyed metrics dict
    ('Mean IoU', 'Overall Acc', ... — stream_metrics.py:57-80 parity).
    Pass a prebuilt `step` (_make_conf_step) to share one compiled program
    across calls — jax.jit caches by callable identity."""
    conf = init_confusion(num_classes)
    if step is None:
        step = _make_conf_step(seg_fn, num_classes)
    for images, gt in batches:
        conf = step(conf, images, gt)
    return compute_metrics(jax.device_get(conf))


def consistency_gap(
    seg_fn: Callable[[jax.Array], jax.Array],
    original_batches: list,
    translated_batches: list,
    num_classes: int = 19,
) -> dict:
    """mIoU of seg(original) vs gt, seg(translated) vs gt, and their gap —
    the quality-parity statement for a translation run. One compiled
    confusion step shared by both passes (was recompiled per call)."""
    step = _make_conf_step(seg_fn, num_classes)
    orig = miou_consistency(seg_fn, original_batches, num_classes, step=step)
    trans = miou_consistency(seg_fn, translated_batches, num_classes, step=step)
    return {
        "original_miou": orig["Mean IoU"],
        "translated_miou": trans["Mean IoU"],
        "miou_consistency_gap": orig["Mean IoU"] - trans["Mean IoU"],
        "original": orig,
        "translated": trans,
    }
