"""Profiling: wall-clock stage timers + jax.profiler trace capture.

TPU equivalent of the reference's CUDA-synchronized manual timers
(`test_performance.py:78-144`, SURVEY.md §5 Tracing/profiling):
`block_until_ready`-based timing with warmup, plus an opt-in
`jax.profiler` trace context for TensorBoard-viewable device traces —
which the reference lacks entirely.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional


def time_fn(
    fn: Callable[[], object], warmup: int = 3, iters: int = 10
) -> Dict[str, float]:
    """Steady-state latency of a device computation in milliseconds."""
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn())
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    n = len(times)
    return {
        "mean_ms": sum(times) / n,
        "p50_ms": times[n // 2],
        "min_ms": times[0],
        "max_ms": times[-1],
        "iters": n,
    }


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None):
    """Capture a jax.profiler trace (viewable in TensorBoard/XProf) around
    a code block; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulating named-stage wall timer for host-side loops."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": self.totals[k],
                "mean_ms": 1e3 * self.totals[k] / max(self.counts[k], 1),
                "count": self.counts[k],
            }
            for k in self.totals
        }
