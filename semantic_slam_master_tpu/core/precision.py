"""Matmul-precision pinning for the geometry solve path.

On TPU, f32 `jnp` matmuls default to fast bf16-grade MXU passes — fine
for the frontend (descriptors, matching scores), but the closed-form
pose solves (Horn-quaternion Kabsch, GN/LM normal equations, Schur
complements) condition badly: a bf16 product in a 4x4 eigen-shift or a
6Kx6K normal system can flip RANSAC hypothesis selection or stall LM on
exactly one seed (ACCURACY_r03's dynamic_sem_gt 6x outlier seed
reproduced on TPU only, never on f32 CPU).

Scope (round 5): the blanket trace-time pin stays ONLY on the
per-keyframe solvers (local BA `slam/ba.py`, pose graph
`slam/posegraph.py`), where it is off the per-frame critical path.
Pinning the per-frame PnP/RANSAC path cost +27% backend latency
(BENCH_r04 0.421 ms vs r03 0.332 ms) because under `jit` the pin turns
every tiny dot in the scan body into un-fusable multi-pass MXU kernels.
There the exact-f32 fix is structural instead: tiny-matrix algebra is
expressed as broadcast-multiply-reduce (`core/lie.py::mm_small`) which
the VPU executes at full f32 inside fusions, and the few genuine
contractions (Kabsch cross-covariance, GN normal equations, the 6x6
solve) carry per-op `Precision.HIGHEST` / a local pin (`slam/pnp.py`).

Reference behaviour being matched: g2o/ORB-SLAM3 solve BA and pose
optimization in f64 on CPU (`baselines/orb_slam3/scripts/setup.sh`,
Thirdparty/g2o) — f32-with-full-precision-matmuls is the TPU-native
equivalent (SURVEY §7.3 "LM/BA numerics").
"""

from __future__ import annotations

import functools

import jax


def f32_matmuls(fn):
    """Trace ``fn`` under full-float32 matmul precision.

    A trace-time setting: wrapping the function body is enough even when
    the caller is inside ``jit`` — every dot/einsum issued while tracing
    the body carries the pinned precision.
    """

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped
