"""Offline loop closing over a finished SLAM run.

The loop-closing half of ORB-SLAM3's back end (SURVEY.md §2.2), as a
post-processing pass:

1. BoW place recognition over keyframes (`slam.bow`),
2. geometric verification + relative pose for each candidate via
   descriptor matching and RANSAC/Kabsch on backprojected keypoints
   (`slam.pnp`),
3. pose-graph optimization of the keyframe chain with loop edges
   (`slam.posegraph`),
4. propagation of keyframe corrections to the in-between frames (each
   frame moves with its nearest preceding keyframe).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import PinholeCamera, backproject
from ..ops import matching
from . import bow, pnp, posegraph
from .tracking import FrameFeatures


def _loop_edge_pose(
    key,
    feats_i: FrameFeatures,
    feats_j: FrameFeatures,
    cam: PinholeCamera,
    min_inliers: int,
):
    """Measured Z = T_i^{-1} T_j from features (maps cam-j points into
    cam-i). Returns (Z, num_inliers)."""
    m = matching.match_hamming(
        feats_j.desc, feats_i.desc, feats_j.valid, feats_i.valid, max_distance=64.0
    )
    pts_j = backproject(feats_j.xy, feats_j.depth, cam)
    xy_i = feats_i.xy[m.idx2]
    d_i = feats_i.depth[m.idx2]
    pts_i = backproject(xy_i, d_i, cam)
    valid = m.valid & (d_i > 0.05)
    result = pnp.ransac_pose(
        key, pts_j, pts_i, xy_i, cam, valid, num_hypotheses=128
    )
    return result.pose, int(result.num_inliers)


def close_sequence_loops(
    poses_wc: np.ndarray,
    features: FrameFeatures,
    is_keyframe: np.ndarray,
    cam: PinholeCamera,
    vocab: jnp.ndarray | None = None,
    min_score: float = 0.35,
    min_frame_gap: int = 30,
    min_inliers: int = 25,
    max_loops: int = 10,
    seed: int = 0,
    exclude=(),
) -> Tuple[np.ndarray, List[Tuple[int, int, float]]]:
    """Detect + close loops; returns (corrected poses (F, 4, 4),
    accepted loop list [(frame_i, frame_j, score)]).

    ``exclude``: (frame_i, frame_j[, score]) loops already closed —
    skipped as candidates (incremental callers: slam.online)."""
    poses_wc = np.asarray(poses_wc, dtype=np.float64)
    kf_idx = np.flatnonzero(np.asarray(is_keyframe))
    if len(kf_idx) < 3:
        return poses_wc, []
    if vocab is None:
        # Train a k-medians vocabulary on this sequence's own descriptors
        # (DBoW trains offline on a corpus; per-sequence training is the
        # self-contained equivalent and discriminates far better than a
        # random codebook on real descriptor distributions).
        corpus = np.asarray(features.desc)[kf_idx].reshape(-1, 8)
        corpus_valid = np.asarray(features.valid)[kf_idx].reshape(-1)
        corpus = corpus[corpus_valid]
        num_words = int(min(1024, max(64, len(corpus) // 4)))
        vocab = bow.train_vocabulary(jnp.asarray(corpus), num_words=num_words)

    candidates = bow.detect_loops(
        features.desc, features.valid, kf_idx, vocab,
        min_score=min_score, min_frame_gap=min_frame_gap,
    )
    done = {(int(e[0]), int(e[1])) for e in exclude}
    candidates = [c for c in candidates if (c[0], c[1]) not in done]
    candidates.sort(key=lambda t: -t[2])

    kf_pos = {int(f): k for k, f in enumerate(kf_idx)}
    key = jax.random.PRNGKey(seed)
    edges = []
    accepted = []
    for fi, fj, score in candidates[:max_loops]:
        key, sub = jax.random.split(key)
        feats_i = jax.tree.map(lambda x: x[fi], features)
        feats_j = jax.tree.map(lambda x: x[fj], features)
        Z, inl = _loop_edge_pose(sub, feats_i, feats_j, cam, min_inliers)
        if inl < min_inliers:
            continue
        edges.append((kf_pos[fi], kf_pos[fj], jnp.asarray(np.asarray(Z)), 5.0))
        accepted.append((fi, fj, score))
    if not edges:
        return poses_wc, []

    kf_poses = jnp.asarray(poses_wc[kf_idx], jnp.float32)
    kf_opt = np.asarray(
        posegraph.close_loops(kf_poses, edges), dtype=np.float64
    )

    # Propagate: frames move rigidly with their nearest preceding keyframe.
    corrected = poses_wc.copy()
    corrections = [
        kf_opt[k] @ np.linalg.inv(poses_wc[kf_idx[k]]) for k in range(len(kf_idx))
    ]
    owner = np.searchsorted(kf_idx, np.arange(len(poses_wc)), side="right") - 1
    owner = np.clip(owner, 0, len(kf_idx) - 1)
    for f in range(len(poses_wc)):
        corrected[f] = corrections[owner[f]] @ poses_wc[f]
    return corrected, accepted
