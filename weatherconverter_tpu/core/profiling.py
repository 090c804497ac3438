"""Tracing / profiling / debug instrumentation.

The reference's only observability is `print_gpu_memory`
(reference: diffusion_model/utils.py:95-99) and tqdm bars. TPU-native
equivalents:

  - `trace(dir)`: jax.profiler trace context -> TensorBoard/Perfetto dump.
  - `annotate(name)`: named TraceAnnotation visible in profiles.
  - `StepTimer`: wall-clock per-step timing with warmup skip (compile steps
    excluded) and simple percentile summaries.
  - `enable_nan_debugging()`: jax_debug_nans (the framework's answer to the
    reference's silent exception swallowing, train_ddpm.py:194-197).
  - `device_memory_stats()`: live HBM usage, the print_gpu_memory analog.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a device trace (view in TensorBoard's profile plugin)."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region annotation inside a trace."""
    return jax.profiler.TraceAnnotation(name)


def enable_nan_debugging(enable: bool = True) -> None:
    """Re-run jitted computations eagerly when a NaN appears and raise at the
    producing op (debug mode only; disables async dispatch)."""
    jax.config.update("jax_debug_nans", enable)


def device_memory_stats(device: Optional[jax.Device] = None) -> dict:
    """Live device memory counters (bytes). Empty dict if the backend does
    not expose them (CPU)."""
    dev = device or jax.devices()[0]
    try:
        return dict(dev.memory_stats() or {})
    except Exception:
        return {}


def format_memory(device: Optional[jax.Device] = None) -> str:
    s = device_memory_stats(device)
    if not s:
        return "memory stats unavailable"
    used = s.get("bytes_in_use", 0) / 2**30
    peak = s.get("peak_bytes_in_use", 0) / 2**30
    limit = s.get("bytes_limit", 0) / 2**30
    return f"HBM used {used:.2f} GiB (peak {peak:.2f} / limit {limit:.2f})"


class StepTimer:
    """Wall-clock per-step timer that skips warmup (compile) steps."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: list[float] = []
        self._count = 0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)
        return False

    def summary(self) -> dict:
        if not self.times:
            return {"steps": 0}
        ts = sorted(self.times)
        n = len(ts)
        return {
            "steps": n,
            "mean_s": sum(ts) / n,
            "p50_s": ts[n // 2],
            "p90_s": ts[min(n - 1, int(n * 0.9))],
            "min_s": ts[0],
            "max_s": ts[-1],
        }
