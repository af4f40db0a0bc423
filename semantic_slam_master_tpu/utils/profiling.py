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


def _salt(args, carry):
    """Inject a loop-carried dependency into the first array leaf of args
    so XLA cannot hoist the repeated computation out of the scan. The
    perturbation is numerically ~0 (float: + carry * 1e-30; int: xor with
    a runtime-zero) but is loop-variant as an *expression*."""
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree.flatten(args)
    for i, leaf in enumerate(leaves):
        if not hasattr(leaf, "dtype"):
            continue
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            leaves[i] = leaf + (carry * 1e-30).astype(leaf.dtype)
            break
        if jnp.issubdtype(leaf.dtype, jnp.integer):
            zero_rt = (carry * 1e-30).astype(jnp.int32).astype(leaf.dtype)
            leaves[i] = leaf ^ zero_rt
            break
    return jax.tree.unflatten(treedef, leaves)


def _to_scalar(out) -> "object":
    import jax
    import jax.numpy as jnp

    total = jnp.float32(0)
    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "dtype"):
            total = total + jnp.sum(leaf.astype(jnp.float32)) * 1e-12
    return total


_CALL_COUNTER = [0]


def make_repeater(fn: Callable, iters: int):
    """Build ONE jitted callable that runs ``fn(*args)`` ``iters`` times
    inside a single scan and returns a host scalar (forcing a real
    device sync). The seed is a traced argument: passing a fresh value
    per call defeats any result caching in the stack WITHOUT retracing.

    Building the closure once matters: a fresh `jax.jit` wrapper per
    timed call re-traces the whole graph every time (seconds for big
    pipelines), and that host-side jitter swamps the marginal signal —
    the failure mode that produced 3x-scattered frontend timings."""
    import jax

    @jax.jit
    def run(seed, args):
        def body(carry, _):
            out = fn(*_salt(args, carry))
            return carry + _to_scalar(out), ()

        total, _ = jax.lax.scan(body, seed * 1e-30, None, length=iters)
        return total

    return run


def repeat_in_jit(fn: Callable, args: tuple, iters: int):
    """One-shot form of :func:`make_repeater` (compiles every call —
    fine for correctness smoke, wrong for timing loops)."""
    import jax

    _CALL_COUNTER[0] += 1
    return float(make_repeater(fn, iters)(jax.numpy.float32(_CALL_COUNTER[0]), args))


def stage_cost(fn: Callable, args: tuple) -> Dict[str, float]:
    """Analytic FLOP / byte counts for one jitted stage from XLA's own
    cost model (`compiled.cost_analysis()`), for MFU/roofline accounting
    alongside :func:`marginal_time_ms`. Returns {"flops": F, "bytes": B}
    (zeros when the backend exposes no cost analysis)."""
    import jax

    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0) or 0.0)
        byts = float(ca.get("bytes accessed", 0.0) or 0.0)
        return {"flops": flops, "bytes": byts}
    except Exception:
        return {"flops": 0.0, "bytes": 0.0}


def marginal_time_ms(
    fn: Callable, args: tuple, iters: int = 32, base_iters: int = 4
) -> Dict[str, float]:
    """Per-call latency via marginal timing: run the in-jit repetition at
    two lengths and divide the best-of-3 time difference by the iteration
    difference — cancels dispatch/transfer/tunnel overhead exactly and is
    robust to round-trip jitter."""
    import jax.numpy as jnp

    run_base = make_repeater(fn, base_iters)
    run_full = make_repeater(fn, iters)

    def seed():
        _CALL_COUNTER[0] += 1
        return jnp.float32(_CALL_COUNTER[0])

    # warm both executables (compile happens here, not in the timed loop)
    float(run_base(seed(), args))
    float(run_full(seed(), args))

    def best(run):
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(seed(), args))
            times.append(time.perf_counter() - t0)
        return min(times)

    t_base = best(run_base)
    t_full = best(run_full)
    per_iter = (t_full - t_base) / max(iters - base_iters, 1)
    return {
        "mean_ms": max(per_iter, 0.0) * 1e3,
        "overhead_ms": max(t_base - per_iter * base_iters, 0.0) * 1e3,
        "iters": iters,
    }


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
