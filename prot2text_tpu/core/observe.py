"""Observability: profiler traces, per-step timing, loss guards.

The reference has no tracing/profiling (SURVEY.md §5: tqdm bars only);
this module adds the TPU-native equivalents:
  * `trace(logdir)` — context manager around `jax.profiler` for TensorBoard/
    xprof traces of jitted steps
  * `StepTimer` — wall-clock per-step timing with rolling throughput
  * `guard_loss` — the reference's inline invariant checks (NaN/inf/≤0
    warning per batch, NaN abort per epoch: train_contrast.py:432-434,
    :477-480) as one helper
"""

from __future__ import annotations

import contextlib
import math
import sys
import time
from typing import Optional


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """Profile the enclosed steps into `logdir` (no-op when logdir=None)."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling per-step wall time + items/sec."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times = []
        self._last = None

    def tick(self, items: int = 1):
        now = time.perf_counter()
        if self._last is not None:
            self.times.append((now - self._last, items))
            if len(self.times) > self.window:
                self.times.pop(0)
        self._last = now

    @property
    def step_seconds(self) -> float:
        if not self.times:
            return float("nan")
        return sum(t for t, _ in self.times) / len(self.times)

    @property
    def items_per_second(self) -> float:
        if not self.times:
            return float("nan")
        total_t = sum(t for t, _ in self.times)
        total_i = sum(i for _, i in self.times)
        return total_i / total_t if total_t > 0 else float("nan")


def guard_loss(loss: float, *, allow_zero: bool = False,
               warn_stream=sys.stderr) -> bool:
    """Returns True if the loss is usable; prints the reference's
    'impossible loss' warning otherwise."""
    bad = math.isnan(loss) or math.isinf(loss)
    if not allow_zero:
        bad = bad or loss <= 0.0
    if bad:
        print(f"WARNING: impossible loss detected ({loss})", file=warn_stream)
    return not bad
