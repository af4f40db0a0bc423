"""Matmul-precision pinning for the geometry solve path.

On TPU, f32 `jnp` matmuls default to fast bf16-grade MXU passes — fine
for the frontend (descriptors, matching scores), but the closed-form
pose solves (Horn-quaternion Kabsch, GN/LM normal equations, Schur
complements) condition badly: a bf16 product in a 4x4 eigen-shift or a
6Kx6K normal system can flip RANSAC hypothesis selection or stall LM on
exactly one seed (ACCURACY_r03's dynamic_sem_gt 6x outlier seed
reproduced on TPU only, never on f32 CPU). These matrices are tiny (3x3
.. tens-of-6x6 blocks), so full-f32 MXU passes cost nothing measurable
against the frontend; pin them.

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
