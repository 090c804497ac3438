"""Preemption-safe training: SIGTERM → flush a checkpoint → clean exit.

TPU slices in production schedulers (and most batch clusters) deliver
SIGTERM with a grace window before killing the worker. The reference has no
handling at all — a preempted run loses everything since the last epoch-
cadence torch.save (reference: diffusion_model/train_ddpm.py:140-141) and
resumes only from that stale point (train_ddpm.py:81-84). Here the training
loops poll a signal-set flag at every step boundary; on preemption they
save the CURRENT train state through the normal (async Orbax) checkpoint
path, block until the write commits, and return cleanly. Resume then
continues from the preempted step's state — deterministically, through the
same restore path the multihost resume test proves bit-identical.

Signal handlers run on the main thread between Python bytecodes; the
handler only sets a flag (async-signal-safe by construction), so a SIGTERM
landing mid-XLA-execution never corrupts a step — the loop finishes the
in-flight step, then checkpoints the post-step state.
"""

from __future__ import annotations

import signal
import threading
from typing import Optional


class PreemptionGuard:
    """Context manager that latches termination signals into a flag.

    Usage:
        with PreemptionGuard() as guard:
            for batch in loader:
                ...
                if guard.triggered:
                    <save + flush checkpoint>; break

    Installs handlers for `signals` (default SIGTERM — the preemption
    notice; SIGINT is left to KeyboardInterrupt so ^C still aborts hard)
    on __enter__ and restores the previous handlers on __exit__. A second
    signal while the flag is already set re-raises the default behavior so
    a stuck flush can still be killed. Off the main thread (where CPython
    forbids signal(), e.g. a serving worker driving train()) the guard
    degrades to an always-False flag instead of crashing.
    """

    def __init__(self, signals: tuple = (signal.SIGTERM,)):
        self._signals = signals
        self._prev: dict = {}
        self._event = threading.Event()
        self.received: Optional[int] = None

    @property
    def triggered(self) -> bool:
        return self._event.is_set()

    def _handler(self, signum, frame):
        if self._event.is_set():
            # second notice: restore default and let it terminate (the
            # flush itself hung, or the grace window is over)
            signal.signal(signum, self._prev.get(signum, signal.SIG_DFL))
            signal.raise_signal(signum)
            return
        self.received = signum
        self._event.set()

    def __enter__(self) -> "PreemptionGuard":
        for s in self._signals:
            try:
                self._prev[s] = signal.signal(s, self._handler)
            except ValueError:  # not on the main thread
                pass
        return self

    def __exit__(self, *exc) -> None:
        for s, prev in self._prev.items():
            try:
                signal.signal(s, prev)
            except ValueError:
                pass
        self._prev.clear()
        return None


def preempt_save_index(ckpt, global_step: int) -> int:
    """A save index for a preemption checkpoint that is unique and
    monotonic within the run's CheckpointManager: epoch-cadence saves use
    small epoch numbers, so the global step count is normally larger; if a
    tiny run makes them collide, bump past the latest saved index (Orbax
    refuses non-increasing steps)."""
    latest = ckpt.latest_step()
    if latest is not None and global_step <= latest:
        return latest + 1
    return max(global_step, 1)
