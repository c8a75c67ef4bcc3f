"""Tracing/profiling helpers.

The reference's observability is wall-clock meters only (SURVEY.md §5.1:
AverageMeter batch/data time, per-step postfix timers). Here the same meters
plus first-class device tracing via jax.profiler.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


class AverageMeter:
    """Running value/avg meter (reference train_tokenizer.py:45-61)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val, self.avg, self.sum, self.count = 0.0, 0.0, 0.0, 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


class StepTimer:
    """Tracks data-wait and step durations, yielding samples/sec."""

    def __init__(self):
        self.batch_time = AverageMeter()
        self.data_time = AverageMeter()
        self._last = time.time()

    def data_ready(self):
        now = time.time()
        self.data_time.update(now - self._last)
        return now

    def step_done(self, n_samples: int = 1):
        now = time.time()
        self.batch_time.update(now - self._last)
        self._last = now
        return n_samples / max(self.batch_time.val, 1e-9)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """jax.profiler trace scope; no-op when log_dir is None.

    View with tensorboard/xprof pointed at log_dir.
    """
    if log_dir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region visible in device traces."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield
