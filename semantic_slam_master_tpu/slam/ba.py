"""Local bundle adjustment: Levenberg-Marquardt with a Schur complement.

TPU-native replacement for g2o's sparse BA (SURVEY.md §2.2 "g2o" row:
"batched Gauss-Newton/Levenberg-Marquardt least-squares solver in JAX;
dense per-keyframe-window normal equations; Schur complement on
camera/point blocks; semantic/confidence-weighted residuals").

Problem shape is fixed: ``K`` keyframe cameras, ``M`` landmarks, a dense
(K, M) observation grid with a validity mask (missing observations are
masked, not absent — the XLA-friendly encoding of a sparse graph). At
SLAM window sizes (K <= 8, M <= 1024) the dense normal equations are a
few MB and every contraction is an einsum the MXU eats.

The residual weight of observation (k, m) is
``huber(r) * confidence[k, m]`` where confidence carries the semantic
class weight (e.g. down-weighting dynamic 'person' pixels) and the
learned uncertainty head's output — the north star's "semantic labels
weighting the reprojection residuals", which the reference designed but
never wired in (`models/uncertainty_estimator.py:4`).

Gauge freedom is fixed by a strong prior on camera 0.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core import lie
from ..core.camera import PinholeCamera, project
from ..core.fixed import inv3x3
from ..core.precision import f32_matmuls
from .pnp import huber_weights


class BAProblem(NamedTuple):
    """A fixed-shape local BA window.

    poses:        (K, 4, 4) world->camera extrinsics
    points:       (M, 3) world-frame landmarks
    observations: (K, M, 2) pixel measurements
    valid:        (K, M) bool — observation exists
    confidence:   (K, M) float — semantic x uncertainty residual weight
    obs_depth:    (K, M) measured metric depth of the observation (0 =
                  no depth). The depth residual is what makes scale
                  observable — RGB-D BA a la ORB-SLAM's stereo/RGB-D
                  edge; without it a monocular window has a free scale
                  gauge even with camera 0 fixed.
    """

    poses: jnp.ndarray
    points: jnp.ndarray
    observations: jnp.ndarray
    valid: jnp.ndarray
    confidence: jnp.ndarray
    obs_depth: jnp.ndarray

    @staticmethod
    def create(poses, points, observations, valid, confidence=None, obs_depth=None):
        K, M = valid.shape
        if confidence is None:
            confidence = jnp.ones((K, M), dtype=points.dtype)
        if obs_depth is None:
            obs_depth = jnp.zeros((K, M), dtype=points.dtype)
        return BAProblem(poses, points, observations, valid, confidence, obs_depth)


class BAResult(NamedTuple):
    poses: jnp.ndarray
    points: jnp.ndarray
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray


def _residuals_and_weights(
    poses, points, observations, valid, confidence, obs_depth, cam,
    huber_delta, depth_weight,
):
    """3-D residuals [du, dv, w_d * dz] per observation.

    Returns (r (K, M, 3), IRLS weights w (K, M), p_cam (K, M, 3),
    depth_scale (K, M) — the per-observation scale of the z-residual row,
    zero where no depth measurement exists).

    The flat per-meter depth weight is a MEASURED choice (round-3
    negative result): Kinect-model inverse-variance weighting
    (sigma(z) = 1.2 mm + 1.9 mm (z-0.4)^2, Khoshelham & Elberink 2012)
    was swept on the harsh 320-frame loop — anchored at sigma(1 m),
    sigma(2 m), and as the raw 1/sigma — and every variant WORSENED ATE
    (0.026 flat vs 0.034-0.044), as did flat 60/120/240: far depth
    observations carry drift-anchoring signal worth more than their
    noise costs, and the Huber kernel already bounds the outliers.
    """
    p_cam = jax.vmap(lambda T: lie.transform_points(T, points))(poses)  # (K,M,3)
    r_uv = project(p_cam, cam) - observations
    has_depth = obs_depth > 0.05
    depth_scale = depth_weight * has_depth.astype(p_cam.dtype)
    r_z = depth_scale * (p_cam[..., 2] - obs_depth)
    r = jnp.concatenate([r_uv, r_z[..., None]], axis=-1)
    depth_ok = p_cam[..., 2] > 0.05
    r_norm = jnp.linalg.norm(r, axis=-1)
    w = huber_weights(r_norm, huber_delta) * confidence * valid * depth_ok
    return r, w, p_cam, depth_scale


def _robust_cost(r, w):
    return jnp.sum(w * jnp.sum(r * r, axis=-1))




@f32_matmuls
def bundle_adjust(
    problem: BAProblem,
    cam: PinholeCamera,
    num_iters: int = 8,
    huber_delta: float = 3.0,
    init_lambda: float = 1e-3,
    gauge_prior: float = 1e8,
    point_prior: float = 1e-6,
    depth_weight: float = 30.0,
) -> BAResult:
    """Levenberg-Marquardt over (poses, points) with accept/reject damping.

    Per iteration: build the weighted normal equations, eliminate the
    point blocks (Schur), solve the (6K, 6K) reduced camera system,
    back-substitute the points, then accept the step iff the robust cost
    decreased (classic LM lambda schedule: /3 on accept, x5 on reject).
    """
    poses0, points0 = problem.poses, problem.points
    obs, valid, conf = problem.observations, problem.valid, problem.confidence
    obs_depth = problem.obs_depth
    K, M = valid.shape
    eye6 = jnp.eye(6, dtype=poses0.dtype)
    eye3 = jnp.eye(3, dtype=poses0.dtype)

    def cost_of(poses, points):
        r, w, _, _ = _residuals_and_weights(
            poses, points, obs, valid, conf, obs_depth, cam, huber_delta,
            depth_weight,
        )
        return _robust_cost(r, w)

    def lm_step(carry, _):
        poses, points, lam = carry
        r, w, p_cam, depth_scale = _residuals_and_weights(
            poses, points, obs, valid, conf, obs_depth, cam, huber_delta,
            depth_weight,
        )
        cost = _robust_cost(r, w)

        # ---- Jacobian blocks in M-MINOR layout --------------------------
        # The natural einsum formulation ("kmij,kmil->kjl" etc.) makes XLA
        # run tens of thousands of 3x6-sized dot-generals — the batched-
        # tiny-matmul trap; it was 1.2 ms of the 1.5 ms LM iteration at
        # (K=5, M=2048). Here every small index (i, j, l <= 6) is a
        # Python-level unroll over (K, M) planes (fused VPU arithmetic)
        # and every M-reduction is reshaped into a real MXU matmul with M
        # as the contraction dimension.
        x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]  # (K, M)
        z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
        iz = 1.0 / z_safe
        iz2 = iz * iz
        zero = jnp.zeros_like(x)
        # J3 (3 residual rows x 3 point coords), rows: u, v, depth.
        J3 = [
            [cam.fx * iz, zero, -cam.fx * x * iz2],
            [zero, cam.fy * iz, -cam.fy * y * iz2],
            [zero, zero, depth_scale],
        ]
        # A[i][j] = (J3 @ [I | -hat(p)])[i, j]  -> 3 x 6 planes of (K, M).
        # (J3row @ hat(p)) with hat=[[0,-z,y],[z,0,-x],[-y,x,0]]:
        #   col0 = j1*z - j2*y, col1 = -j0*z + j2*x, col2 = j0*y - j1*x.
        A = [
            [
                J3[i][0],
                J3[i][1],
                J3[i][2],
                -(J3[i][1] * z - J3[i][2] * y),
                -(-J3[i][0] * z + J3[i][2] * x),
                -(J3[i][0] * y - J3[i][1] * x),
            ]
            for i in range(3)
        ]
        # B[i][l] = (J3 @ R_k)[i, l] — R varies only over k: broadcast
        # R entries as (K, 1) against (K, M) planes.
        Rs = poses[:, :3, :3]  # (K, 3, 3)
        Rkjl = [[Rs[:, j, l][:, None] for l in range(3)] for j in range(3)]
        B = [
            [
                sum(J3[i][j] * Rkjl[j][l] for j in range(3))
                for l in range(3)
            ]
            for i in range(3)
        ]

        # Weighted planes; residual rows as (K, M) planes.
        Aw = [[w * A[i][j] for j in range(6)] for i in range(3)]
        Bw = [[w * B[i][l] for l in range(3)] for i in range(3)]
        rr = [r[..., 0], r[..., 1], r[..., 2]]  # (K, M) each

        # U[k] = sum_m w A^T A — stack to (K, 3*6, M) and contract (i, m)
        # as a real (6, 3M) x (3M, 6) MXU matmul per k.
        A_t = jnp.stack(
            [jnp.stack(Ai, 0) for Ai in A], 0
        ).transpose(2, 0, 1, 3)  # (K, 3, 6, M)
        Aw_t = A_t * w[:, None, None, :]
        U = jnp.einsum(
            "kijm,kilm->kjl", Aw_t, A_t, preferred_element_type=poses.dtype
        )
        # g_c[k, j] = -sum_{i,m} w A[i,j] r[i]: 3-term plane unroll + row
        # reduction over m.
        g_c = -jnp.stack(
            [
                sum(jnp.sum(Aw[i][j] * rr[i], axis=-1) for i in range(3))
                for j in range(6)
            ],
            axis=-1,
        )  # (K, 6)
        # V[m] (3, 3 planes of (M,)) and g_p[m] — 15-term unrolled
        # reductions over (k, i): pure fused VPU arithmetic, no batched
        # tiny dots.
        Vp = [
            [
                sum(jnp.sum(Bw[i][j] * B[i][l], axis=0) for i in range(3))
                for l in range(3)
            ]
            for j in range(3)
        ]
        g_pp = [
            -sum(jnp.sum(Bw[i][j] * rr[i], axis=0) for i in range(3))
            for j in range(3)
        ]  # 3 x (M,)

        # Damping + gauge prior on camera 0 (additive so it stays strong
        # even at tiny lambda).
        lam_c = lam + gauge_prior * (jnp.arange(K) == 0).astype(poses.dtype)
        U = U + lam_c[:, None, None] * eye6
        damp = lam + point_prior
        V = jnp.stack(
            [jnp.stack(Vj, -1) for Vj in Vp], -2
        )  # (M, 3, 3)
        V = V + damp * eye3

        V_inv = inv3x3(V)  # (M, 3, 3) closed-form batched inverse
        Vi = [[V_inv[:, j, l] for l in range(3)] for j in range(3)]  # (M,)

        # Wb[k][j][l] = sum_i w A[i,j] B[i,l] — 3-term plane unroll.
        Wbp = [
            [sum(Aw[i][j] * B[i][l] for i in range(3)) for l in range(3)]
            for j in range(6)
        ]  # 6 x 3 planes of (K, M)
        # WVi[k][j][p] = sum_l Wb[j][l] V_inv[l][p] ((M,) broadcasts over K).
        WVip = [
            [
                sum(Wbp[j][l] * Vi[l][p][None, :] for l in range(3))
                for p in range(3)
            ]
            for j in range(6)
        ]

        # Reduced camera system: ONE (6K, 3M) x (3M, 6K) MXU matmul.
        X = jnp.stack(
            [jnp.stack(WVip[j], 1) for j in range(6)], 1
        )  # (K, 6, 3, M)
        Y = jnp.stack(
            [jnp.stack(Wbp[j], 1) for j in range(6)], 1
        )  # (K, 6, 3, M)
        S2 = -(X.reshape(K * 6, 3 * M) @ Y.reshape(K * 6, 3 * M).T)
        S2 = S2.reshape(K, 6, K, 6).at[jnp.arange(K), :, jnp.arange(K), :].add(U)
        rhs = g_c - jnp.stack(
            [
                sum(jnp.sum(WVip[j][p] * g_pp[p][None, :], axis=-1) for p in range(3))
                for j in range(6)
            ],
            axis=-1,
        )  # (K, 6)

        S_flat = S2.reshape(6 * K, 6 * K)
        delta_c = jnp.linalg.solve(S_flat, rhs.reshape(6 * K)).reshape(K, 6)
        # Back-substitute points: t[l] = g_p[l] - sum_{k,j} Wb[j][l] dc[k,j].
        dc = [delta_c[:, j, None] for j in range(6)]
        tl = [
            g_pp[l] - sum(jnp.sum(Wbp[j][l] * dc[j], axis=0) for j in range(6))
            for l in range(3)
        ]  # 3 x (M,)
        delta_p = jnp.stack(
            [sum(Vi[j][l] * tl[l] for l in range(3)) for j in range(3)],
            axis=-1,
        )  # (M, 3)

        finite = jnp.all(jnp.isfinite(delta_c)) & jnp.all(jnp.isfinite(delta_p))
        delta_c = jnp.where(finite, delta_c, 0.0)
        delta_p = jnp.where(finite, delta_p, 0.0)

        new_poses = jax.vmap(lambda d, T: lie.se3_exp(d) @ T)(delta_c, poses)
        new_points = points + delta_p
        new_cost = cost_of(new_poses, new_points)

        accept = new_cost < cost
        poses = jnp.where(accept, new_poses, poses)
        points = jnp.where(accept, new_points, points)
        lam = jnp.where(accept, lam / 3.0, lam * 5.0)
        lam = jnp.clip(lam, 1e-8, 1e6)
        return (poses, points, lam), cost

    init_cost = cost_of(poses0, points0)
    (poses, points, _), _ = jax.lax.scan(
        lm_step, (poses0, points0, jnp.asarray(init_lambda, poses0.dtype)), None,
        length=num_iters,
    )
    return BAResult(
        poses=poses,
        points=points,
        initial_cost=init_cost,
        final_cost=cost_of(poses, points),
    )
