"""Streaming metrics (confusion-matrix mIoU etc.)."""

from weatherconverter_tpu.metrics.stream import (
    AverageMeter,
    StreamSegMetrics,
    compute_metrics,
    confusion_update,
    init_confusion,
)

__all__ = [
    "StreamSegMetrics", "AverageMeter", "compute_metrics",
    "confusion_update", "init_confusion",
]
