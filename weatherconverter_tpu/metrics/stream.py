"""Streaming segmentation metrics.

TPU-first re-design of `StreamSegMetrics`
(reference: seg_model/metrics/stream_metrics.py:25-83): the confusion-matrix
update is a pure jnp function (`confusion_update`) that runs ON DEVICE inside
the jitted eval step (no per-batch device->host copy of the label maps, which
is what the reference's numpy `_fast_hist` forces, stream_metrics.py:49-55);
only the (C, C) matrix crosses to the host at the end. The derived metrics
(Overall/Mean Acc, FreqW Acc, Mean IoU, per-class IoU) reproduce
stream_metrics.py:57-80 exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

IGNORE_INDEX = 255


def confusion_update(
    conf: jax.Array, pred: jax.Array, label: jax.Array, num_classes: int
) -> jax.Array:
    """Add one batch to the (C, C) confusion matrix [rows = gt, cols = pred]
    (reference `_fast_hist`, stream_metrics.py:49-55). Ignored pixels
    (label >= num_classes, e.g. 255) are dropped via the same mask trick."""
    label = label.reshape(-1)
    pred = pred.reshape(-1)
    mask = (label >= 0) & (label < num_classes)
    idx = jnp.where(mask, num_classes * label + pred, num_classes * num_classes)
    hist = jnp.bincount(idx.astype(jnp.int32), length=num_classes * num_classes + 1)
    return conf + hist[:-1].reshape(num_classes, num_classes).astype(conf.dtype)


def init_confusion(num_classes: int) -> jax.Array:
    """int32 accumulation: float32 counts silently lose increments past
    2^24 (~17M pixels in one cell — a single large validation pass over a
    dominant class reaches that), skewing the mIoU that drives best-model
    selection. int32 additions are exact to 2.1e9; compute_metrics promotes
    to float64 on host."""
    return jnp.zeros((num_classes, num_classes), dtype=jnp.int32)


def compute_metrics(conf: np.ndarray) -> dict:
    """Derive the metric dict from the confusion matrix
    (reference: stream_metrics.py:57-80). Keys match the reference's
    `get_results` so downstream logging is drop-in."""
    conf = np.asarray(conf, dtype=np.float64)
    eps = 1e-12
    gt_sum = conf.sum(axis=1)
    pred_sum = conf.sum(axis=0)
    diag = np.diag(conf)
    total = conf.sum()

    acc = diag.sum() / max(total, eps)
    acc_cls_per = diag / np.maximum(gt_sum, eps)
    present = gt_sum > 0
    acc_cls = np.nanmean(np.where(present, acc_cls_per, np.nan))
    union = gt_sum + pred_sum - diag
    iu = diag / np.maximum(union, eps)
    mean_iu = np.nanmean(np.where(present | (pred_sum > 0), iu, np.nan))
    freq = gt_sum / max(total, eps)
    fwavacc = (freq[freq > 0] * iu[freq > 0]).sum()
    cls_iu = {int(i): float(iu[i]) for i in range(conf.shape[0])}
    return {
        "Overall Acc": float(acc),
        "Mean Acc": float(acc_cls),
        "FreqW Acc": float(fwavacc),
        "Mean IoU": float(mean_iu),
        "Class IoU": cls_iu,
    }


class StreamSegMetrics:
    """Host-side streaming wrapper with the reference's interface
    (reference: stream_metrics.py:25-47: update / get_results / reset /
    to_str). `update` accepts device or numpy arrays."""

    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self.reset()

    def update(self, label_trues, label_preds) -> None:
        # accumulate HOST-side in int64: shipping self._conf through the
        # device round-trip downcast it to f32 (x64 disabled), re-creating
        # the 2^24 count-loss init_confusion guards against
        batch = confusion_update(
            init_confusion(self.num_classes),
            jnp.asarray(label_preds), jnp.asarray(label_trues), self.num_classes,
        )
        self._conf = self._conf + np.asarray(batch, dtype=np.int64)

    def update_confusion(self, conf) -> None:
        """Merge an externally accumulated (C, C) matrix (the fast path: keep
        accumulation inside the jitted eval step, merge once per epoch)."""
        self._conf = self._conf + np.asarray(conf, dtype=np.int64)

    def get_results(self) -> dict:
        return compute_metrics(self._conf)

    def reset(self) -> None:
        self._conf = np.zeros((self.num_classes, self.num_classes), dtype=np.int64)

    @staticmethod
    def to_str(results: dict) -> str:
        s = "\n"
        for k, v in results.items():
            if k != "Class IoU":
                s += f"{k}: {v:.6f}\n"
        return s


class AverageMeter:
    """(reference: stream_metrics.py:85-110) — running average bookkeeping."""

    def __init__(self):
        self.book = {}

    def reset_all(self):
        self.book.clear()

    def reset(self, id: str):
        item = self.book.get(id)
        if item is not None:
            item[0] = 0.0
            item[1] = 0

    def update(self, id: str, val: float):
        record = self.book.get(id)
        if record is None:
            self.book[id] = [float(val), 1]
        else:
            record[0] += float(val)
            record[1] += 1

    def get_results(self, id: str) -> float:
        record = self.book.get(id)
        assert record is not None
        return record[0] / record[1]
