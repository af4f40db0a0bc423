"""Online (chunked) SLAM: schedule parity + streaming loop closure.

The reference's loop-closing capability is an ORB-SLAM3 C++ thread
(SURVEY.md §2.2); here it runs between fixed-size scan chunks
(slam/online.py). Two contracts are pinned:

1. chunking is a pure execution-schedule change — with loop closure off,
   run_slam_online == run_slam bit-for-bit (same per-frame keys);
2. on a self-retracing trajectory the online pass accepts a loop and the
   correction leaves the trajectory finite and no worse than uncorrected.
"""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from semantic_slam_master_tpu.data import synthetic
from semantic_slam_master_tpu.eval import ate_rpe
from semantic_slam_master_tpu.ops import image
from semantic_slam_master_tpu.slam import online, system, tracking

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)


def _features(seq, num_keypoints=300):
    frames = seq.frames()
    gray = jnp.stack([image.rgb_to_gray(jnp.asarray(f["rgb"])) for f in frames])
    depth = jnp.stack([jnp.asarray(f["depth"]) for f in frames])
    return tracking.extract_features(gray, depth, num_keypoints=num_keypoints)


def _out_and_back(n_half=8, scale=0.5):
    ts, poses = synthetic.orbit_trajectory(n_half)
    poses_full = np.concatenate([poses, poses[::-1]], axis=0)
    return synthetic.SyntheticSequence(
        cam=synthetic.TUM_FR2.scaled(scale, scale),
        timestamps=np.arange(len(poses_full)) / 30.0,
        poses_wc=poses_full,
    )


def test_chunked_matches_monolithic():
    seq = synthetic.make_sequence(num_frames=13, scale=0.5)
    feats = _features(seq)
    cfg = system.SlamConfig(num_landmarks=1024, window_size=4, ba_iters=2)
    key = jax.random.PRNGKey(3)

    ref = system.run_slam(key, feats, seq.cam, cfg)
    out, loops = online.run_slam_online(
        key, feats, seq.cam, cfg, chunk_size=5, enable_loop_closure=False
    )
    assert loops == []
    # Chunked and monolithic are the same ALGORITHM (same keyframe
    # decisions, same match counts — pinned exactly below), but they are
    # different XLA programs: fusion reorders f32 arithmetic inside the
    # open-coded Kabsch/GN math, so poses agree only to f32 noise (the
    # old 1e-5 bound held while Kabsch was an opaque SVD custom call
    # with fixed internal order).
    np.testing.assert_allclose(
        np.asarray(out.poses_wc), np.asarray(ref.poses_wc), atol=1e-3
    )
    np.testing.assert_array_equal(
        np.asarray(out.num_inliers), np.asarray(ref.num_inliers)
    )
    np.testing.assert_array_equal(
        np.asarray(out.is_keyframe), np.asarray(ref.is_keyframe)
    )


def test_online_loop_closure_accepts_and_stays_sane():
    seq = _out_and_back(n_half=8)
    feats = _features(seq)
    # Force a keyframe on every tracked frame so the BoW database has
    # nodes along the whole retraced path (the tiny box room is a single
    # "place", so the support-ratio policy alone stops adding them).
    cfg = system.SlamConfig(
        num_landmarks=1024, window_size=4, ba_iters=2,
        keyframe_min_inlier_ratio=1.1,
    )
    out, loops = online.run_slam_online(
        jax.random.PRNGKey(0), feats, seq.cam, cfg,
        chunk_size=4, min_frame_gap=6, min_score=0.2, min_inliers=15,
    )
    assert len(loops) >= 1, "retraced path must close at least one loop"
    fi, fj, _ = loops[0]
    assert fi - fj >= 6
    poses = np.asarray(out.poses_wc, np.float64)
    assert np.all(np.isfinite(poses))

    ref = system.run_slam(jax.random.PRNGKey(0), feats, seq.cam, cfg)
    ate_plain = ate_rpe.compute_ate(seq.poses_wc, np.asarray(ref.poses_wc, np.float64))["rmse"]
    ate_online = ate_rpe.compute_ate(seq.poses_wc, poses)["rmse"]
    assert ate_online < max(ate_plain * 1.5, 0.05), (ate_plain, ate_online)


def test_correction_transform_consistency():
    """_apply_correction must keep landmark/keyframe geometry consistent:
    a world point p observed at pixel u by keyframe T_cw still projects
    to u after the rigid re-anchoring."""
    cfg = system.SlamConfig(num_landmarks=64, window_size=2)
    rng = np.random.default_rng(0)
    state = system.init_map(cfg)
    pts = rng.normal(0, 1, (64, 3)).astype(np.float32) + [0, 0, 5]
    T_cw = np.eye(4, dtype=np.float32)
    state = state._replace(
        positions=jnp.asarray(pts),
        kf_poses=jnp.stack([jnp.asarray(T_cw)] * 2),
    )
    from semantic_slam_master_tpu.core import lie

    delta = np.asarray(
        lie.se3_exp(jnp.asarray([0.1, -0.2, 0.3, 0.05, -0.02, 0.04])), np.float64
    )
    new_state, T_new = online._apply_correction(
        state, jnp.eye(4), jnp.asarray(delta, jnp.float32)
    )
    # camera-frame coordinates of each landmark must be invariant
    before = pts @ np.asarray(T_cw)[:3, :3].T + np.asarray(T_cw)[:3, 3]
    Tc = np.asarray(new_state.kf_poses[0], np.float64)
    after = (
        np.asarray(new_state.positions, np.float64) @ Tc[:3, :3].T + Tc[:3, 3]
    )
    np.testing.assert_allclose(after, before, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(T_new), delta @ np.eye(4), atol=1e-5
    )
