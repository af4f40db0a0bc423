import pytest

import jax
import jax.numpy as jnp
import numpy as np

from semantic_slam_master_tpu.core import lie
from semantic_slam_master_tpu.data import synthetic
from semantic_slam_master_tpu.ops import image
from semantic_slam_master_tpu.slam import loop_closing, system, tracking

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)


def _out_and_back_sequence(n_half=8, scale=0.5):
    """A trajectory that retraces itself — frame k and frame 2*n_half-1-k
    see the same place."""
    ts, poses = synthetic.orbit_trajectory(n_half)
    poses_full = np.concatenate([poses, poses[::-1]], axis=0)
    ts_full = np.arange(len(poses_full)) / 30.0
    seq = synthetic.SyntheticSequence(
        cam=synthetic.TUM_FR2.scaled(scale, scale),
        timestamps=ts_full,
        poses_wc=poses_full,
    )
    return seq


def test_loop_closing_end_to_end():
    seq = _out_and_back_sequence()
    frames = seq.frames()
    gray = jnp.stack([image.rgb_to_gray(jnp.asarray(f["rgb"])) for f in frames])
    depth = jnp.stack([jnp.asarray(f["depth"]) for f in frames])
    feats = tracking.extract_features(gray, depth, num_keypoints=300)
    cfg = system.SlamConfig(num_landmarks=1024, window_size=4, ba_iters=2,
                            keyframe_min_inlier_ratio=0.8)
    out = system.run_slam(jax.random.PRNGKey(0), feats, seq.cam, cfg)

    poses = np.asarray(out.poses_wc, np.float64)
    # Force keyframes across the whole path (the tiny box room is a single
    # "place", so the SLAM keyframe policy stops adding them on the
    # retraced half — loop closing needs nodes there).
    is_kf = np.arange(len(poses)) % 2 == 0
    corrected, loops = loop_closing.close_sequence_loops(
        poses, feats, is_kf, seq.cam, min_frame_gap=10, min_score=0.2,
        min_inliers=15,
    )
    assert corrected.shape == poses.shape
    assert np.all(np.isfinite(corrected))
    # the retraced path must produce at least one accepted loop
    assert len(loops) >= 1, loops
    fi, fj, score = loops[0]
    assert fi - fj >= 10

    # correction must not damage accuracy
    from semantic_slam_master_tpu.eval import ate_rpe

    ate_before = ate_rpe.compute_ate(seq.poses_wc, poses)["rmse"]
    ate_after = ate_rpe.compute_ate(seq.poses_wc, corrected)["rmse"]
    assert ate_after < max(ate_before * 1.5, 0.05), (ate_before, ate_after)


def test_loop_closing_no_keyframes_noop():
    seq = _out_and_back_sequence(n_half=3, scale=0.25)
    frames = seq.frames()
    gray = jnp.stack([image.rgb_to_gray(jnp.asarray(f["rgb"])) for f in frames])
    depth = jnp.stack([jnp.asarray(f["depth"]) for f in frames])
    feats = tracking.extract_features(gray, depth, num_keypoints=200)
    poses = np.tile(np.eye(4), (len(frames), 1, 1))
    corrected, loops = loop_closing.close_sequence_loops(
        poses, feats, np.zeros(len(frames), bool), seq.cam
    )
    assert loops == []
    assert np.allclose(corrected, poses)
