"""Profiling hooks.

The reference has only coarse wall-clock prints (SURVEY §5.1). Here:
a jax.profiler trace context for capturing device traces (viewable with
TensorBoard/XProf) and a lightweight epoch timer that forces device sync
so measured times are real.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def device_trace(logdir: Optional[str]):
    """Capture an XLA device trace into logdir (no-op when logdir is None)."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class EpochTimer:
    """Per-epoch wall timing with forced device synchronization."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.time()

    def stop(self, sync_on=None) -> float:
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        dt = time.time() - self._t0
        self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0


def annotate(name: str):
    """Named profiler region (shows up in captured traces)."""
    return jax.profiler.TraceAnnotation(name)
