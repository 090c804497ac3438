"""Host-side batching + prefetching loader.

Replaces torch DataLoader (reference: diffusion_model/train_ddpm.py:182-184,
seg train.py:311-328 — both run workers=0, i.e. synchronous decode in the
train loop). Here decode runs in a thread pool and batches are prefetched
into a bounded queue so the host pipeline overlaps with TPU steps; the
device-side random augmentation (data/transforms.py) happens inside the
jitted train step, so the loader only ships uint8 arrays.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional, Sequence

import numpy as np


def _stack(samples):
    if isinstance(samples[0], tuple):
        return tuple(np.stack([s[i] for s in samples]) for i in range(len(samples[0])))
    return np.stack(samples)


class _LoaderError:
    """Producer-thread exception carrier (unambiguous vs tuple batches)."""

    def __init__(self, exc: BaseException):
        self.exc = exc


class DataLoader:
    """Shuffling, batching, prefetching iterator over an indexable dataset.

    - drop_last=True keeps batch shapes static (XLA-friendly; torch defaults
      to False but ragged final batches would trigger recompiles).
    - Deterministic shuffle from `seed` + epoch (reference relies on global
      torch seeding, train_ddpm.py:32-34).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 8,
        prefetch: int = 4,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self) -> list[np.ndarray]:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            rng.shuffle(idx)
        nb = len(self)
        return [idx[i * self.batch_size : (i + 1) * self.batch_size] for i in range(nb)]

    def __iter__(self) -> Iterator:
        batches = self._index_batches()
        self.epoch += 1
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        get_batch = getattr(self.dataset, "get_batch", None)

        def put(item) -> bool:
            # bounded-wait put so an abandoned consumer (break mid-epoch)
            # can always wake the producer via `stop` instead of leaking the
            # thread parked in a blocking q.put forever
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for bidx in batches:
                        if stop.is_set():
                            return
                        # dataset batch fast-path (native C++ decode pool);
                        # None = native unavailable -> decode THIS batch on
                        # the worker pool instead of serially
                        batch = get_batch(bidx) if get_batch is not None else None
                        if batch is None:
                            samples = list(pool.map(self.dataset.__getitem__, bidx))
                            batch = _stack(samples)
                        if not put(batch):
                            return
                put(None)
            except BaseException as e:
                # surface decode errors in the consumer thread — a dead
                # producer with no sentinel would hang training silently
                put(_LoaderError(e))

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, _LoaderError):
                    raise item.exc
                yield item
        finally:
            stop.set()
            # drain so a producer blocked in put() exits promptly
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    t.join(timeout=0.05)


def infinite_batches(loader: DataLoader) -> Iterator:
    """Epoch-crossing stream (each pass reshuffles with the epoch counter)."""
    while True:
        yield from loader
