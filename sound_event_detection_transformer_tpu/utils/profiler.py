"""Profiling hooks: jax.profiler traces + step timing.

The reference has no profiler integration, only wall-clock meters
(SURVEY.md §5).  This module adds the TPU-native story: XLA trace capture
(viewable in TensorBoard / Perfetto) plus per-step host timing with the same
meter surface as ``utils/meters.py``.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax

from .meters import AverageMeter


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/sedt_trace") -> Iterator[None]:
    """Capture an XLA profiler trace around a code block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a trace (shows up on the TraceMe timeline)."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """data_time / batch_time meters (reference engine.py:39-47,87-93).

    CAVEAT: in the device-accumulated train loops (no per-step fetch) every
    step call returns as soon as XLA *dispatch* completes, so ``batch_time``
    measures host dispatch latency only — NOT device execution.  Honest
    per-step time is epoch wall-clock / n_steps (what the epoch log line
    reports); op-level truth comes from tools/xplane_report.py.  The meters
    stay useful for spotting host-side stalls (data_time) and dispatch
    hiccups, which is why the loops still carry them.
    """

    def __init__(self):
        self.data_time = AverageMeter()
        self.batch_time = AverageMeter()
        self._end = time.time()

    def data_loaded(self):
        self.data_time.update(time.time() - self._end)

    def step_done(self):
        self.batch_time.update(time.time() - self._end)
        self._end = time.time()

    def summary(self) -> str:
        return (
            f"data_time:{self.data_time.val:.3f}({self.data_time.avg:.3f}) "
            f"batch_time:{self.batch_time.val:.3f}({self.batch_time.avg:.3f})"
        )
