"""Differentiable Lie-group math for SO(3)/SE(3) in pure jnp.

TPU-native replacement for the Sophus C++ library bundled inside the
reference's ORB-SLAM3 baseline (see SURVEY.md §2.2; reference
`baselines/orb_slam3/scripts/setup.sh:222-223`) and for the host-side
quaternion conversion in `semantic-slam/data/tum_dataset.py:257-272`.

Conventions
-----------
- Rotations are 3x3 matrices, poses are 4x4 homogeneous matrices mapping
  points from the *world* frame into the *camera* frame unless noted.
- Quaternions follow the TUM format ordering ``(qx, qy, qz, qw)``.
- Tangent vectors for SE(3) are ``(rho, phi)`` = (translational, rotational),
  each 3-vectors, i.e. ``exp([rho, phi])``.
- Everything is batch-friendly: functions operate on the trailing axes and
  can be `vmap`-ed or called with leading batch dims where documented.

All functions are differentiable and safe at the ``theta -> 0`` singularity
(Taylor-series branches selected with `jnp.where` on a guarded argument, the
standard trick to keep gradients finite under XLA).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def mm_small(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Tiny-matrix matmul (..., m, k) @ (..., k, n) as multiply-reduce.

    On TPU a `dot_general` over 3x3/4x4 operands becomes its own MXU
    kernel AND runs f32 inputs through bf16-grade passes by default —
    in a sequential SLAM scan body that is both a dispatch cost (one
    kernel launch per tiny dot) and a precision loss (~2^-8 relative,
    i.e. ~px-scale reprojection error at fx~520 on metre-scale points).
    Expressed as broadcast-multiply + reduce over the tiny contraction
    axis, XLA fuses whole chains into VPU kernels at exact f32. This is
    the geometry-path replacement for the f32 precision pin of round 4
    (`core/precision.py`), which fixed the accuracy but cost +27%
    backend latency (BENCH_r04 0.421 ms vs r03 0.332 ms).
    """
    return jnp.sum(A[..., :, :, None] * B[..., None, :, :], axis=-2)


def mv_small(A: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Tiny matvec (..., m, k) @ (..., k) as multiply-reduce (see mm_small)."""
    return jnp.sum(A * x[..., None, :], axis=-1)


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of a 3-vector. Supports leading batch dims."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def vee(m: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`hat`."""
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def _safe_theta(phi: jnp.ndarray):
    """(theta_sq, theta_safe, small): gradient-safe angle decomposition.

    ``theta_safe`` equals the true angle outside the small region and a
    constant 1.0 inside it, so `where`-selected exact branches never see a
    non-differentiable sqrt(0) (the double-where trick; a plain
    ``norm(phi)`` has a NaN gradient at phi = 0).
    """
    theta_sq = jnp.sum(phi * phi, axis=-1)
    small = theta_sq < 1e-8
    theta_sq_safe = jnp.where(small, 1.0, theta_sq)
    theta_safe = jnp.sqrt(theta_sq_safe)
    return theta_sq, theta_sq_safe, theta_safe, small


def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues' formula: axis-angle 3-vector -> rotation matrix."""
    theta_sq, theta_sq_safe, theta, small = _safe_theta(phi)
    K = hat(phi)
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(
        small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / theta_sq_safe
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * mm_small(K, K)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> axis-angle 3-vector (principal branch).

    Numerically robust near theta=0 and usable up to theta close to pi.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    w = vee(R - jnp.swapaxes(R, -1, -2)) * 0.5  # = sin(theta) * axis
    # theta via atan2 (differentiable at identity, unlike arccos whose
    # gradient blows up at cos = 1); double-where guards sqrt(0).
    s_sq = jnp.sum(w * w, axis=-1)  # = sin(theta)^2
    small = s_sq < 1e-12
    s_safe = jnp.sqrt(jnp.where(small, 1.0, s_sq))
    theta = jnp.arctan2(s_safe, cos_theta)
    # phi = theta/sin(theta) * w; Taylor 1 + theta^2/6 near 0 (theta ~ |w|).
    scale = jnp.where(small, 1.0 + s_sq / 6.0, theta / s_safe)
    phi = w * scale[..., None]
    # Near theta = pi the formula above degrades; fall back to the
    # diagonal-based axis extraction.
    near_pi = cos_theta < -1.0 + 1e-6
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_sq = jnp.maximum((diag + 1.0) * 0.5, 0.0)
    axis = jnp.sqrt(axis_sq)
    # Fix signs using off-diagonal entries relative to the largest component.
    s0 = jnp.sign(jnp.where(R[..., 2, 1] - R[..., 1, 2] >= 0, 1.0, -1.0))
    s1 = jnp.sign(jnp.where(R[..., 0, 2] - R[..., 2, 0] >= 0, 1.0, -1.0))
    s2 = jnp.sign(jnp.where(R[..., 1, 0] - R[..., 0, 1] >= 0, 1.0, -1.0))
    axis = axis * jnp.stack([s0, s1, s2], axis=-1)
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), _EPS)
    phi_pi = axis * theta[..., None]
    return jnp.where(near_pi[..., None], phi_pi, phi)


def _so3_left_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian J_l of SO(3), used by the SE(3) exponential."""
    theta_sq, theta_sq_safe, theta, small = _safe_theta(phi)
    K = hat(phi)
    b = jnp.where(
        small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / theta_sq_safe
    )
    c = jnp.where(
        small,
        1.0 / 6.0 - theta_sq / 120.0,
        (theta - jnp.sin(theta)) / (theta_sq_safe * theta),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + b[..., None, None] * K + c[..., None, None] * mm_small(K, K)


def _so3_left_jacobian_inv(phi: jnp.ndarray) -> jnp.ndarray:
    theta_sq, theta_sq_safe, theta, small = _safe_theta(phi)
    K = hat(phi)
    half = theta * 0.5
    cot_coeff = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.sin(half)) / theta_sq_safe,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye - 0.5 * K + cot_coeff[..., None, None] * mm_small(K, K)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """SE(3) exponential. ``xi = (rho, phi)`` (6,) -> 4x4 matrix."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    t = mv_small(_so3_left_jacobian(phi), rho)
    return make_pose(R, t)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) logarithm. 4x4 matrix -> ``xi = (rho, phi)`` (6,)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    phi = so3_log(R)
    rho = mv_small(_so3_left_jacobian_inv(phi), t)
    return jnp.concatenate([rho, phi], axis=-1)


def make_pose(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble a 4x4 homogeneous transform from R (...,3,3), t (...,3)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (4,)
    )[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


def pose_inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a rigid transform."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_pose(Rt, -mv_small(Rt, t))


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 transform to (..., N, 3) points."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    # (..., N, 3) x (..., 3, 3)^T as multiply-reduce: exact f32, fuses
    # under the RANSAC hypothesis vmap instead of launching MXU dots.
    return jnp.sum(pts[..., :, None, :] * R[..., None, :, :], axis=-1) + t[..., None, :]


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """TUM-order quaternion ``(qx, qy, qz, qw)`` -> rotation matrix.

    Same math as the reference's host-side converter
    (`semantic-slam/data/tum_dataset.py:258-272`), vectorized and
    differentiable.
    """
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    qx, qy, qz, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (qy**2 + qz**2)
    r01 = 2 * (qx * qy - qz * qw)
    r02 = 2 * (qx * qz + qy * qw)
    r10 = 2 * (qx * qy + qz * qw)
    r11 = 1 - 2 * (qx**2 + qz**2)
    r12 = 2 * (qy * qz - qx * qw)
    r20 = 2 * (qx * qz - qy * qw)
    r21 = 2 * (qy * qz + qx * qw)
    r22 = 1 - 2 * (qx**2 + qy**2)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> TUM-order quaternion ``(qx, qy, qz, qw)``.

    Branch-free Shepperd's method: compute all four candidate solutions and
    select the best-conditioned one with `where` (XLA-friendly).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidate 4*q_i^2 values.
    qw2 = 1.0 + tr
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    def _safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    # Case w: q = [ (m21-m12)/s, (m02-m20)/s, (m10-m01)/s, s/4 ] with s=2*sqrt(qw2)
    sw = 2.0 * _safe_sqrt(qw2)
    cand_w = jnp.stack(
        [(m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw, sw / 4.0], axis=-1
    )
    sx = 2.0 * _safe_sqrt(qx2)
    cand_x = jnp.stack(
        [sx / 4.0, (m01 + m10) / sx, (m02 + m20) / sx, (m21 - m12) / sx], axis=-1
    )
    sy = 2.0 * _safe_sqrt(qy2)
    cand_y = jnp.stack(
        [(m01 + m10) / sy, sy / 4.0, (m12 + m21) / sy, (m02 - m20) / sy], axis=-1
    )
    sz = 2.0 * _safe_sqrt(qz2)
    cand_z = jnp.stack(
        [(m02 + m20) / sz, (m12 + m21) / sz, sz / 4.0, (m10 - m01) / sz], axis=-1
    )

    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)[
        ..., 0, :
    ]
    # Canonical sign: qw >= 0 (matches evo/TUM conventions).
    q = q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def relative_pose(T1: jnp.ndarray, T2: jnp.ndarray) -> jnp.ndarray:
    """``T_rel = T2 @ T1^{-1}`` — the reference's frame-pair convention
    (`semantic-slam/data/tum_dataset.py:191`)."""
    return mm_small(T2, pose_inverse(T1))


def rotation_angle(R: jnp.ndarray) -> jnp.ndarray:
    """Geodesic rotation angle (radians) of a rotation matrix."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0))
