"""Pose-graph optimization for loop closure.

The global-consistency half of the g2o replacement (SURVEY.md §2.2 —
ORB-SLAM3's loop-closing runs pose-graph optimization over keyframes):
given a chain of odometry edges plus loop-closure edges, minimize

    sum_e || log( Z_e^{-1} (T_i^{-1} T_j) ) ||^2_W

over keyframe poses T (world->camera is irrelevant here; we optimize
camera-in-world). Damped Gauss-Newton on the SE(3) tangent of every
pose, with the Jacobian built by forward-mode autodiff of the residual
stack — the graph is small (tens to hundreds of keyframes), so the
dense (6E, 6K) Jacobian is MXU-friendly and exact.

Gauge: pose 0 is pinned with a strong prior.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from ..core.precision import f32_matmuls


class PoseGraph(NamedTuple):
    """poses (K, 4, 4) camera-in-world initial estimates; edges between
    node indices i -> j with measured relative transforms
    Z = T_i^{-1} T_j (4, 4) and scalar weights."""

    poses: jnp.ndarray  # (K, 4, 4)
    edge_i: jnp.ndarray  # (E,) int32
    edge_j: jnp.ndarray  # (E,) int32
    edge_T: jnp.ndarray  # (E, 4, 4)
    edge_weight: jnp.ndarray  # (E,)


def chain_edges(poses: jnp.ndarray, weight: float = 1.0):
    """Odometry edges (k, k+1) from a trajectory estimate."""
    K = poses.shape[0]
    i = jnp.arange(K - 1)
    j = i + 1
    Z = jax.vmap(lambda a, b: lie.pose_inverse(a) @ b)(poses[:-1], poses[1:])
    return i.astype(jnp.int32), j.astype(jnp.int32), Z, jnp.full((K - 1,), weight)


def _residuals(xi: jnp.ndarray, graph: PoseGraph) -> jnp.ndarray:
    """Stacked weighted edge residuals for tangent updates xi (K, 6):
    T_k = exp(xi_k) @ T_k0."""
    poses = jax.vmap(lambda d, T: lie.se3_exp(d) @ T)(xi, graph.poses)
    Ti = poses[graph.edge_i]
    Tj = poses[graph.edge_j]
    pred = jax.vmap(lambda a, b: lie.pose_inverse(a) @ b)(Ti, Tj)
    err = jax.vmap(lambda z, p: lie.se3_log(lie.pose_inverse(z) @ p))(
        graph.edge_T, pred
    )  # (E, 6)
    w = jnp.sqrt(graph.edge_weight)[:, None]
    return (err * w).reshape(-1)


@f32_matmuls
def optimize(
    graph: PoseGraph,
    num_iters: int = 10,
    damping: float = 1e-6,
    gauge_weight: float = 1e6,
) -> jnp.ndarray:
    """Gauss-Newton pose-graph solve. Returns optimized poses (K, 4, 4)."""
    K = graph.poses.shape[0]

    def step(poses, _):
        g = graph._replace(poses=poses)

        def res(flat_xi):
            return _residuals(flat_xi.reshape(K, 6), g)

        x0 = jnp.zeros(K * 6)
        r = res(x0)
        J = jax.jacfwd(res)(x0)  # (6E, 6K)
        H = J.T @ J
        # gauge prior on pose 0
        H = H.at[jnp.arange(6), jnp.arange(6)].add(gauge_weight)
        H = H + damping * jnp.eye(K * 6)
        delta = -jnp.linalg.solve(H, J.T @ r)
        delta = jnp.where(jnp.all(jnp.isfinite(delta)), delta, jnp.zeros_like(delta))
        new_poses = jax.vmap(lambda d, T: lie.se3_exp(d) @ T)(
            delta.reshape(K, 6), poses
        )
        return new_poses, jnp.sum(r * r)

    poses, costs = jax.lax.scan(step, graph.poses, None, length=num_iters)
    return poses


_optimize_jit = jax.jit(optimize, static_argnames=("num_iters",))

# Shape buckets for the online path: the keyframe count grows every
# chunk and the loop-edge count grows every acceptance, and XLA compiles
# one program per shape — unbucketed, a streaming run recompiles the
# whole GN scan (jacfwd Jacobian and all) at every closing pass, which
# dominated wall time (~hundreds of seconds per harsh 320-frame run).
# Bucketing bounds compiles to O(log-ish F) cache misses per process.
_K_BUCKET = 32
_E_BUCKET = 8


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def close_loops(
    poses_kf: jnp.ndarray,
    loop_edges,  # [(i_kf, j_kf, T_rel (4,4), weight)]
    odometry_weight: float = 1.0,
    num_iters: int = 10,
    pad_shapes: bool = True,
) -> jnp.ndarray:
    """Convenience wrapper: odometry chain + loop edges -> optimized
    keyframe poses. ``T_rel`` measures T_i^{-1} T_j.

    With ``pad_shapes`` (the default) the keyframe and loop-edge counts
    are padded to fixed buckets so repeated calls with growing graphs
    hit the jit cache instead of recompiling: padding keyframes REPEAT
    the last real pose (their chain-edge measurements are then exactly
    identity, contributing zero residual at the solution and keeping H
    well-conditioned), and padding loop edges are zero-weight self-edges
    (exactly zero contribution). The returned slice matches the
    unpadded solve to float tolerance.
    """
    K = int(poses_kf.shape[0])
    if pad_shapes:
        Kp = max(_round_up(K, _K_BUCKET), _K_BUCKET)
        if Kp > K:
            tail = jnp.broadcast_to(poses_kf[-1], (Kp - K, 4, 4))
            poses_pad = jnp.concatenate([poses_kf, tail], axis=0)
        else:
            poses_pad = poses_kf
    else:
        Kp, poses_pad = K, poses_kf

    ei, ej, eT, ew = chain_edges(poses_pad, odometry_weight)
    n_loop = len(loop_edges)
    Ep = (
        max(_round_up(n_loop, _E_BUCKET), _E_BUCKET) if pad_shapes else n_loop
    )
    if Ep:
        li = jnp.zeros((Ep,), jnp.int32)
        lj = jnp.zeros((Ep,), jnp.int32)
        lT = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (Ep, 4, 4))
        lw = jnp.zeros((Ep,), jnp.float32)
        if n_loop:
            li = li.at[:n_loop].set(
                jnp.asarray([e[0] for e in loop_edges], jnp.int32)
            )
            lj = lj.at[:n_loop].set(
                jnp.asarray([e[1] for e in loop_edges], jnp.int32)
            )
            lT = lT.at[:n_loop].set(
                jnp.stack([jnp.asarray(e[2], jnp.float32) for e in loop_edges])
            )
            lw = lw.at[:n_loop].set(
                jnp.asarray([e[3] for e in loop_edges], jnp.float32)
            )
        ei = jnp.concatenate([ei, li])
        ej = jnp.concatenate([ej, lj])
        eT = jnp.concatenate([eT, lT])
        ew = jnp.concatenate([ew, lw])
    graph = PoseGraph(
        poses=poses_pad, edge_i=ei, edge_j=ej, edge_T=eT, edge_weight=ew
    )
    return _optimize_jit(graph, num_iters=num_iters)[:K]
