"""Pose estimation: weighted Kabsch, robust Gauss-Newton PnP, vmapped RANSAC.

TPU-native replacement for the pose-optimization half of g2o inside the
reference's baselines (SURVEY.md §2.2 — "PnP + Gauss-Newton/LM pose
solve"). Design per SURVEY.md §7.3 "RANSAC/PnP on device": no early-exit
host loops — a *fixed budget* of minimal hypotheses is scored in one
vmapped batch and the argmax-inlier hypothesis is refined by a fixed
number of damped Gauss-Newton steps on the SE(3) tangent.

Conventions: ``T`` maps world (or frame-1) points into the camera frame;
updates are left-multiplied, ``T <- exp(delta) @ T``.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core import lie
from ..core.camera import PinholeCamera, project


def _mm(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Tiny-matrix matmul as broadcast-multiply-reduce (VPU, fusable).

    A `dot_general` on (..., 4, 4) operands becomes its OWN MXU kernel —
    a chain of them (e.g. a power iteration under the RANSAC vmap) is a
    chain of kernel launches, which is what makes the sequential SLAM
    backend dispatch-bound (~270 kernels/frame measured in the compiled
    scan body, round-4 audit). Expressed as mul+reduce over the size-4
    contraction axis, XLA fuses the whole chain into a handful of VPU
    fusions instead.
    """
    return jnp.sum(A[..., :, :, None] * B[..., None, :, :], axis=-2)


def _mv(A: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Tiny matvec as broadcast-multiply-reduce (see _mm)."""
    return jnp.sum(A * x[..., None, :], axis=-1)


def _inv4x4_sym(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a symmetric 4x4 via 2x2 block elimination.

    [[P, Q], [Q^T, S]]^-1 with 2x2 closed-form inverses and the Schur
    complement — ~60 fused elementwise ops, no LU (batched/small
    `jnp.linalg` lowers to scalarization-bound LAPACK-style loops on
    TPU). Used by Horn-Kabsch Rayleigh refinement; inputs there are
    deliberately near-singular shifts, so the 2x2 inverses guard their
    determinants and the caller rejects blown-up solves.
    """

    def inv2(M):
        a, b, c, d = M[..., 0, 0], M[..., 0, 1], M[..., 1, 0], M[..., 1, 1]
        det = a * d - b * c
        det = jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
        row0 = jnp.stack([d, -b], axis=-1)
        row1 = jnp.stack([-c, a], axis=-1)
        return jnp.stack([row0, row1], axis=-2) / det[..., None, None]

    def mm2(X, Y):
        return jnp.sum(X[..., :, :, None] * Y[..., None, :, :], axis=-2)

    P, Q = A[..., :2, :2], A[..., :2, 2:]
    S = A[..., 2:, 2:]
    P_inv = inv2(P)
    # Schur complement of P.
    Sc = S - mm2(mm2(jnp.swapaxes(Q, -1, -2), P_inv), Q)
    Sc_inv = inv2(Sc)
    PiQ = mm2(P_inv, Q)
    TL = P_inv + mm2(mm2(PiQ, Sc_inv), jnp.swapaxes(PiQ, -1, -2))
    TR = -mm2(PiQ, Sc_inv)
    BL = jnp.swapaxes(TR, -1, -2)
    top = jnp.concatenate([TL, TR], axis=-1)
    bot = jnp.concatenate([BL, Sc_inv], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def kabsch(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    power_iters: int = 24,
) -> jnp.ndarray:
    """Weighted closed-form rigid alignment: T with dst ≈ T @ src.

    src, dst: (N, 3); weights: (N,) nonnegative. Returns (4, 4).

    Horn's quaternion method instead of SVD Procrustes: the optimal
    rotation is the top eigenvector of a symmetric 4x4 built from the
    cross-covariance, found here by a fixed-count shifted power
    iteration — pure fused VPU arithmetic that vmaps cleanly over RANSAC
    hypothesis batches. `jnp.linalg.svd` on a (64, 3, 3) hypothesis
    batch costs 0.33 ms on a v5e core (batched-small-LAPACK trap; 65% of
    the whole RANSAC stage), the power iteration microseconds. The
    Frobenius shift makes N + cI PSD so the iteration converges to
    Horn's lambda_max; quaternions cannot encode reflections, so the
    SVD path's det guard is unnecessary. Eigenvector parity vs SVD
    Kabsch is pinned to <0.05 deg in tests/test_pnp.py.
    """
    if weights is None:
        weights = jnp.ones(src.shape[0], dtype=src.dtype)
    w = weights / jnp.maximum(jnp.sum(weights), 1e-8)
    mu_s = jnp.sum(src * w[:, None], axis=0)
    mu_d = jnp.sum(dst * w[:, None], axis=0)
    src_c = src - mu_s
    dst_c = dst - mu_d
    # S[a, b] = sum_n w * src_a * dst_b (Horn's convention) — computed as
    # an outer-product reduce: exact f32 on the VPU and fusable under the
    # RANSAC hypothesis vmap (a dot here is a bf16-grade MXU kernel).
    S = jnp.sum((src_c * w[:, None])[:, :, None] * dst_c[:, None, :], axis=0)
    sxx, sxy, sxz = S[0, 0], S[0, 1], S[0, 2]
    syx, syy, syz = S[1, 0], S[1, 1], S[1, 2]
    szx, szy, szz = S[2, 0], S[2, 1], S[2, 2]
    N = jnp.stack(
        [
            jnp.stack([sxx + syy + szz, syz - szy, szx - sxz, sxy - syx]),
            jnp.stack([syz - szy, sxx - syy - szz, sxy + syx, szx + sxz]),
            jnp.stack([szx - sxz, sxy + syx, -sxx + syy - szz, syz + szy]),
            jnp.stack([sxy - syx, szx + sxz, syz + szy, -sxx - syy + szz]),
        ]
    )
    # Shift so every eigenvalue is positive -> powering converges to
    # Horn's (algebraically largest) eigenvalue, not the largest |.|.
    # Powering alone stalls when the top eigenvalues are close (weak
    # geometry), so a few Rayleigh-quotient iterations — cubically
    # convergent, using the closed-form blockwise 4x4 inverse — finish
    # the job to machine precision.
    c = jnp.sqrt(jnp.sum(N * N)) + 1e-12
    eye4 = jnp.eye(4, dtype=N.dtype)
    Ns = N + c * eye4
    # Ns^(2^k) by repeated normalized squaring: the rows of Ns^32 are the
    # four orthonormal inits e1..e4 power-iterated 32 times (at least one
    # of e1..e4 has overlap >= 1/2 with the top eigenvector — a single
    # init can be near-orthogonal to it, and power + Rayleigh would then
    # converge into the lambda_2 basin, a 180-deg-wrong rotation). Five
    # squarings replace `power_iters` explicit iterations: under the
    # RANSAC hypothesis vmap each explicit iteration was its own batched
    # 4x4 `dot_general` kernel plus a normalization kernel (~50 launches
    # per frame); the mul+reduce squarings fuse into a handful of VPU
    # kernels (round-4 dispatch audit). Frobenius normalization between
    # squarings keeps f32 magnitudes bounded (growth <= ||Ns||_F^2 = 1
    # per step after the first normalization).
    P = Ns / c
    for _ in range(max(5, (power_iters + 5) // 6)):
        P = _mm(P, P)
        P = P / (jnp.sqrt(jnp.sum(P * P, axis=(-2, -1), keepdims=True)) + 1e-30)
    Q = P / jnp.maximum(
        jnp.sqrt(jnp.sum(P * P, axis=-1, keepdims=True)), 1e-20
    )
    mu4 = jnp.sum(_mm(Q, N) * Q, axis=-1)
    q = Q[jnp.argmax(mu4)]
    for _ in range(3):
        mu = jnp.sum(q * _mv(N, q))
        shifted = N - (mu - 1e-6 * c) * eye4
        x = _mv(_inv4x4_sym(shifted), q)
        n = jnp.sqrt(jnp.sum(x * x))
        # Keep the previous vector if the solve blew up (exactly singular
        # shift: q already IS the eigenvector).
        q = jnp.where(n > 1e-18, x / jnp.maximum(n, 1e-30), q)
    # Horn's eigenvector is (qw, qx, qy, qz); quat_to_matrix takes TUM
    # order (qx, qy, qz, qw).
    R = lie.quat_to_matrix(jnp.stack([q[1], q[2], q[3], q[0]]))
    t = mu_d - _mv(R, mu_s)
    return lie.make_pose(R, t)


def reprojection_residuals(
    T: jnp.ndarray,
    points: jnp.ndarray,
    observations: jnp.ndarray,
    cam: PinholeCamera,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Residuals r = proj(T p) - obs and a positive-depth mask.

    points (N, 3) in the source frame; observations (N, 2) pixels.
    """
    p_cam = lie.transform_points(T, points)
    r = project(p_cam, cam) - observations
    return r, p_cam[..., 2] > 0.05


def _projection_jacobians(
    p_cam: jnp.ndarray, cam: PinholeCamera
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Analytic Jacobians of the pixel residual.

    Returns (J_point (N, 2, 3), J_pose (N, 2, 6)) where J_pose is w.r.t.
    a left-multiplied tangent update ``exp([rho, phi]) T`` — the standard
    dp/dxi = [I | -hat(p)] chain.
    """
    x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    iz = 1.0 / z_safe
    iz2 = iz * iz
    zero = jnp.zeros_like(x)
    # d(uv)/d(p_cam): (N, 2, 3)
    J_proj = jnp.stack(
        [
            jnp.stack([cam.fx * iz, zero, -cam.fx * x * iz2], axis=-1),
            jnp.stack([zero, cam.fy * iz, -cam.fy * y * iz2], axis=-1),
        ],
        axis=-2,
    )
    # dp/dxi = [I_3 | -hat(p)]: (N, 3, 6)
    I3 = jnp.broadcast_to(jnp.eye(3, dtype=p_cam.dtype), p_cam.shape[:-1] + (3, 3))
    J_p = jnp.concatenate([I3, -lie.hat(p_cam)], axis=-1)
    return J_proj, _mm(J_proj, J_p)


def huber_weights(r_norm: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IRLS weights of the Huber loss (g2o's robust kernel)."""
    return jnp.where(r_norm <= delta, 1.0, delta / jnp.maximum(r_norm, 1e-8))


class PnPResult(NamedTuple):
    pose: jnp.ndarray  # (4, 4)
    num_inliers: jnp.ndarray  # scalar int32
    inlier_mask: jnp.ndarray  # (N,) bool
    rmse: jnp.ndarray  # scalar — inlier reprojection rmse (px)


def refine_pose(
    T_init: jnp.ndarray,
    points: jnp.ndarray,
    observations: jnp.ndarray,
    cam: PinholeCamera,
    weights: jnp.ndarray | None = None,
    num_iters: int = 10,
    huber_delta: float = 3.0,
    damping: float = 1e-4,
) -> jnp.ndarray:
    """Damped Gauss-Newton on SE(3) minimizing robust reprojection error.

    ``weights`` are per-observation confidences (semantic / uncertainty
    weighting hook — the north-star residual weighting; the reference
    declares but never wires this, `uncertainty_estimator.py:4`).
    Fixed iteration count -> one XLA while-free unrolled/scan loop.
    """
    n = points.shape[0]
    w_conf = jnp.ones(n, dtype=points.dtype) if weights is None else weights

    def step(T, _):
        r, depth_ok = reprojection_residuals(T, points, observations, cam)
        p_cam = lie.transform_points(T, points)
        _, J_pose = _projection_jacobians(p_cam, cam)
        r_norm = jnp.linalg.norm(r, axis=-1)
        w = huber_weights(r_norm, huber_delta) * w_conf * depth_ok
        # Normal equations: (J^T W J + lambda I) delta = -J^T W r
        JW = J_pose * w[:, None, None]
        # The 6x6 system conditions badly; full-f32 MXU passes on these
        # tiny contractions cost nothing and keep the r04 precision fix
        # (core/precision.py) without pinning the whole traced body.
        hi = jax.lax.Precision.HIGHEST
        H = jnp.einsum("nij,nik->jk", JW, J_pose, precision=hi)
        g = jnp.einsum("nij,ni->j", JW, r, precision=hi)
        H = H + damping * jnp.eye(6, dtype=H.dtype)
        with jax.default_matmul_precision("float32"):
            delta = -jnp.linalg.solve(H, g)
        # Guard: reject non-finite updates (singular H on degenerate input).
        delta = jnp.where(jnp.all(jnp.isfinite(delta)), delta, jnp.zeros(6))
        return _mm(lie.se3_exp(delta), T), None

    T_final, _ = jax.lax.scan(step, T_init, None, length=num_iters)
    return T_final


def count_inliers(
    T: jnp.ndarray,
    points: jnp.ndarray,
    observations: jnp.ndarray,
    cam: PinholeCamera,
    valid: jnp.ndarray,
    threshold: float = 3.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    r, depth_ok = reprojection_residuals(T, points, observations, cam)
    err = jnp.linalg.norm(r, axis=-1)
    mask = (err < threshold) & depth_ok & valid
    return jnp.sum(mask), mask


def ransac_pose(
    key: jax.Array,
    points: jnp.ndarray,
    points_dst: jnp.ndarray,
    observations: jnp.ndarray,
    cam: PinholeCamera,
    valid: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    num_hypotheses: int = 64,
    sample_size: int = 3,
    inlier_threshold: float = 3.0,
    refine_iters: int = 10,
) -> PnPResult:
    """Fixed-budget RANSAC + robust GN polish for RGB-D correspondences.

    points (N, 3): 3D points in the source frame (e.g. backprojected
    frame-1 / map points). points_dst (N, 3): the same correspondences
    backprojected in the *destination* frame with its depth — used only
    for closed-form minimal hypotheses (3-point Kabsch). observations
    (N, 2): destination-frame pixels used for scoring + refinement, so
    destination depth noise does not bias the final pose.

    All hypotheses are generated and scored in one vmapped batch; the
    best-by-inlier-count is refined with all inliers (the TPU-native
    RANSAC shape, SURVEY.md §7.3).

    ``weights`` (semantic / confidence, nonnegative) enter THREE places:
    minimal-sample draw probabilities, hypothesis support scoring, and
    the GN polish. A rigidly-moving dynamic object (fr3_walking persons)
    forms a consistent rival consensus; if weights only touched the
    refinement, unweighted argmax-inlier voting would still elect the
    mover's motion whenever it owns >50% of matches. Weighted support
    makes the static world win the vote even when outnumbered.
    """
    n = points.shape[0]
    w_sem = (
        valid.astype(jnp.float32)
        if weights is None
        else valid.astype(jnp.float32) * weights
    )
    # Pre-draw sample indices, biased to valid high-weight correspondences.
    probs = w_sem + 1e-6
    probs = probs / probs.sum()
    idx = jax.random.choice(
        key, n, shape=(num_hypotheses, sample_size), replace=True, p=probs
    )

    def hypothesis(sample_idx):
        T = kabsch(points[sample_idx], points_dst[sample_idx])
        inl, mask = count_inliers(
            T, points, observations, cam, valid, inlier_threshold
        )
        support = jnp.sum(mask * w_sem)  # semantically-weighted consensus
        return T, inl, support

    Ts, inls, supports = jax.vmap(hypothesis)(idx)
    best = jnp.argmax(supports)
    T_best = Ts[best]

    # Refine on inliers of the best hypothesis (soft: weight = inlier mask).
    _, mask = count_inliers(T_best, points, observations, cam, valid, inlier_threshold)
    w = mask.astype(points.dtype)
    if weights is not None:
        w = w * weights
    T_ref = refine_pose(
        T_best, points, observations, cam, weights=w, num_iters=refine_iters
    )
    # Keep the refinement only if it didn't lose weighted support (guards
    # the rare degenerate-sample polish divergence).
    inl_ref, mask_ref = count_inliers(
        T_ref, points, observations, cam, valid, inlier_threshold
    )
    sup_ref = jnp.sum(mask_ref * w_sem)
    inl_best = inls[best]
    use_ref = sup_ref >= supports[best]
    T_final = jnp.where(use_ref, T_ref, T_best)
    inl_final = jnp.where(use_ref, inl_ref, inl_best)
    mask_final = jnp.where(use_ref, mask_ref, mask)

    r, _ = reprojection_residuals(T_final, points, observations, cam)
    err2 = jnp.sum(r * r, axis=-1)
    rmse = jnp.sqrt(
        jnp.sum(err2 * mask_final) / jnp.maximum(jnp.sum(mask_final), 1)
    )
    return PnPResult(
        pose=T_final,
        num_inliers=inl_final.astype(jnp.int32),
        inlier_mask=mask_final,
        rmse=rmse,
    )
