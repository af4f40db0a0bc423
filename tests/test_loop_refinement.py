"""Tests for incremental BoW indexing and post-loop map refinement
(round-3 loop-closing completion)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_slam_master_tpu.core.camera import PinholeCamera
from semantic_slam_master_tpu.slam import bow, system


def _rand_desc(rng, n):
    return rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


def test_bow_index_trains_once_and_caches():
    rng = np.random.default_rng(0)
    idx = bow.BowIndex(num_words=64, min_train_keyframes=3)
    base = _rand_desc(rng, 80)
    # Before enough keyframes: no vocab, no signatures.
    idx.add_keyframe(base, np.ones(80, bool), 0)
    assert idx.vocab is None and len(idx.frame_ids) == 0
    idx.add_keyframe(_rand_desc(rng, 80), np.ones(80, bool), 10)
    idx.add_keyframe(_rand_desc(rng, 80), np.ones(80, bool), 40)
    # Vocab trained once the threshold is reached; buffer drained.
    assert idx.vocab is not None
    assert idx.frame_ids == [0, 10, 40]
    vocab_id = id(idx.vocab)
    # A revisit of frame 0's descriptors scores highest against frame 0.
    idx.add_keyframe(base, np.ones(80, bool), 90)
    assert id(idx.vocab) == vocab_id  # never retrained
    cands = idx.new_candidates(1, min_score=0.2, min_frame_gap=30)
    assert cands and cands[0][0] == 90 and cands[0][1] == 0
    # Temporal exclusion respected.
    for fi, fj, _ in cands:
        assert fi - fj >= 30


def test_bow_index_new_candidates_only_scores_new():
    rng = np.random.default_rng(1)
    idx = bow.BowIndex(num_words=64, min_train_keyframes=3)
    for k, f in enumerate([0, 5, 50]):
        idx.add_keyframe(_rand_desc(rng, 60), np.ones(60, bool), f)
    # num_new=0 -> nothing scored
    assert idx.new_candidates(0, min_score=-1.0, min_frame_gap=1) == []
    # num_new=1 -> pairs only involve the newest keyframe
    cands = idx.new_candidates(1, min_score=-1.0, min_frame_gap=1)
    assert cands and all(fi == 50 for fi, _, _ in cands)


def _make_cam():
    return PinholeCamera(fx=100.0, fy=100.0, cx=32.0, cy=32.0, width=64, height=64)


def test_refine_active_map_retriangulates():
    """Landmarks perturbed away from their observations get pulled back
    to the depth-backprojected consensus of the (correct) keyframes."""
    cam = _make_cam()
    cfg = system.SlamConfig(num_landmarks=64, window_size=3, ba_iters=2)
    rng = np.random.default_rng(2)
    M, W = cfg.num_landmarks, cfg.window_size

    # True world points in front of two keyframes at identity / small shift
    pts_true = np.stack(
        [rng.uniform(-0.5, 0.5, M), rng.uniform(-0.5, 0.5, M),
         rng.uniform(2.0, 3.0, M)], axis=-1
    ).astype(np.float32)
    T0 = np.eye(4, dtype=np.float32)
    T1 = np.eye(4, dtype=np.float32); T1[0, 3] = -0.1  # cam at x=+0.1

    def project(T_cw, pts):
        pc = pts @ T_cw[:3, :3].T + T_cw[:3, 3]
        return (
            np.stack([cam.fx * pc[:, 0] / pc[:, 2] + cam.cx,
                      cam.fy * pc[:, 1] / pc[:, 2] + cam.cy], -1),
            pc[:, 2],
        )

    obs = np.zeros((W, M, 2), np.float32)
    dep = np.zeros((W, M), np.float32)
    val = np.zeros((W, M), bool)
    for k, T in enumerate([T0, T1]):
        xy, z = project(T, pts_true)
        obs[k], dep[k], val[k] = xy, z, True

    state = system.init_map(cfg)
    state = state._replace(
        positions=jnp.asarray(pts_true + rng.normal(0, 0.3, (M, 3)).astype(np.float32)),
        lm_valid=jnp.ones((M,), bool),
        kf_poses=jnp.asarray(np.stack([T0, T1, np.eye(4, dtype=np.float32)])),
        kf_obs=jnp.asarray(obs),
        kf_obs_depth=jnp.asarray(dep),
        kf_valid=jnp.asarray(val),
        kf_used=jnp.asarray([True, True, False]),
    )
    out = system.refine_active_map(state, cam, cfg)
    err = np.linalg.norm(np.asarray(out.positions) - pts_true, axis=-1)
    assert np.median(err) < 0.02, np.median(err)


def test_refine_active_map_keeps_unobserved():
    """Landmarks with no live window observations keep their positions."""
    cam = _make_cam()
    cfg = system.SlamConfig(num_landmarks=32, window_size=2, ba_iters=1)
    state = system.init_map(cfg)
    pos = jnp.asarray(np.random.default_rng(3).normal(size=(32, 3)), jnp.float32)
    state = state._replace(positions=pos, lm_valid=jnp.ones((32,), bool))
    out = system.refine_active_map(state, cam, cfg)
    assert np.allclose(np.asarray(out.positions), np.asarray(pos))
