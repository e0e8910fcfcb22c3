"""Profiling helpers: trace capture + simple per-step timing stats.

TPU-native replacement for the reference's wall-clock-only Timer telemetry
(SURVEY.md §5: "jax.profiler trace annotations + per-step timing host
callback").  Traces are viewable with TensorBoard's profile plugin or
xprof; capture is best-effort (some remote-TPU transports don't support it).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List


@contextlib.contextmanager
def capture_trace(log_dir: str):
    """Capture a jax.profiler trace into ``log_dir`` (no-op on failure)."""
    import jax

    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # transport may not support profiling
        print(f"[profiling] trace capture unavailable: {e}")
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


class StepStats:
    """Rolling per-step latency stats (p50/p90/mean) for serving telemetry."""

    def __init__(self, window: int = 200):
        self.window = window
        self.samples: List[float] = []

    @contextlib.contextmanager
    def measure(self):
        t0 = time.perf_counter()
        yield
        self.samples.append(time.perf_counter() - t0)
        if len(self.samples) > self.window:
            self.samples.pop(0)

    def summary(self) -> Dict[str, float]:
        if not self.samples:
            return {}
        s = sorted(self.samples)
        n = len(s)
        return {
            "p50_ms": s[n // 2] * 1000,
            "p90_ms": s[int(n * 0.9)] * 1000,
            "mean_ms": sum(s) / n * 1000,
            "n": n,
        }
