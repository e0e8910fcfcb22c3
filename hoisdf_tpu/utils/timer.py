"""Wall-clock averaging timer (parity: common/timer.py:41-70, incl. the
10-call warmup before averaging) plus a jax.profiler trace hook."""

from __future__ import annotations

import contextlib
import time


class Timer:
    def __init__(self, warmup: int = 10):
        self.warmup = warmup
        self.reset()

    def reset(self):
        self.calls = 0
        self.total_time = 0.0
        self.average_time = 0.0
        self.diff = 0.0
        self._start = None

    def tic(self):
        self._start = time.perf_counter()

    def toc(self, average: bool = True) -> float:
        self.diff = time.perf_counter() - self._start
        self.calls += 1
        if self.calls > self.warmup:
            self.total_time += self.diff
            self.average_time = self.total_time / (self.calls - self.warmup)
        else:
            self.average_time = self.diff
        return self.average_time if average else self.diff


@contextlib.contextmanager
def trace_annotation(name: str):
    """jax.profiler annotation (the TPU-native replacement for the
    reference's tot/gpu/read timers; SURVEY.md §5 tracing)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
