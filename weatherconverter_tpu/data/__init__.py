"""Data: dataset discovery, native decode, on-device transforms, loader."""

from weatherconverter_tpu.data.datasets import (
    DiffusionImageDataset,
    SegPairedDataset,
)
from weatherconverter_tpu.data.loader import DataLoader, infinite_batches

__all__ = [
    "DiffusionImageDataset", "SegPairedDataset", "DataLoader",
    "infinite_batches",
]
