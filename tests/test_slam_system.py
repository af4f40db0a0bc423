import pytest

import jax
import jax.numpy as jnp
import numpy as np

from semantic_slam_master_tpu.data import synthetic
from semantic_slam_master_tpu.eval import ate_rpe
from semantic_slam_master_tpu.ops import image
from semantic_slam_master_tpu.slam import system, tracking

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)


def _features(num_frames, scale=0.5, num_keypoints=400):
    seq = synthetic.make_sequence(num_frames=num_frames, scale=scale)
    frames = seq.frames()
    gray = jnp.stack([image.rgb_to_gray(jnp.asarray(f["rgb"])) for f in frames])
    depth = jnp.stack([jnp.asarray(f["depth"]) for f in frames])
    feats = tracking.extract_features(gray, depth, num_keypoints=num_keypoints)
    return seq, feats


def test_slam_runs_and_recovers_trajectory():
    seq, feats = _features(num_frames=12)
    cfg = system.SlamConfig(num_landmarks=1024, window_size=4, ba_iters=3)
    out = system.run_slam(jax.random.PRNGKey(0), feats, seq.cam, cfg)

    assert out.poses_wc.shape == (12, 4, 4)
    assert np.all(np.isfinite(np.asarray(out.poses_wc)))
    assert np.asarray(out.num_inliers)[1:].min() > 15

    ate = ate_rpe.compute_ate(seq.poses_wc, np.asarray(out.poses_wc, dtype=np.float64))
    assert ate["rmse"] < 0.03, ate


def test_slam_keyframes_created():
    seq, feats = _features(num_frames=12)
    cfg = system.SlamConfig(
        num_landmarks=1024, window_size=4, ba_iters=2,
        keyframe_min_inlier_ratio=0.9,  # aggressive: force keyframes
    )
    out = system.run_slam(jax.random.PRNGKey(0), feats, seq.cam, cfg)
    assert np.asarray(out.is_keyframe).sum() >= 2
    assert np.all(np.isfinite(np.asarray(out.poses_wc)))


def test_slam_deterministic():
    seq, feats = _features(num_frames=6, scale=0.25, num_keypoints=200)
    cfg = system.SlamConfig(num_landmarks=512, window_size=3, ba_iters=2)
    o1 = system.run_slam(jax.random.PRNGKey(3), feats, seq.cam, cfg)
    o2 = system.run_slam(jax.random.PRNGKey(3), feats, seq.cam, cfg)
    assert np.allclose(np.asarray(o1.poses_wc), np.asarray(o2.poses_wc))


def test_low_weight_keypoints_never_become_landmarks():
    """min_landmark_weight excludes dynamic-class keypoints from the map
    (DynaSLAM-style): they stay matchable frame-side but never anchor it."""
    import jax.numpy as jnp

    from semantic_slam_master_tpu.slam import system, tracking

    N = 32
    cfg = system.SlamConfig(num_landmarks=64)
    xy = jnp.stack(
        [
            jnp.linspace(40.0, 200.0, N),
            jnp.full((N,), 60.0),
        ],
        axis=-1,
    )
    feats = tracking.FrameFeatures(
        xy=xy,
        desc=jnp.arange(N * 8, dtype=jnp.uint32).reshape(N, 8),
        depth=jnp.full((N,), 2.0),
        valid=jnp.ones((N,), bool),
        score=jnp.ones((N,)),
        sem_weight=jnp.where(jnp.arange(N) < 10, 0.05, 1.0),
    )
    from semantic_slam_master_tpu.core.camera import TUM_FR2

    state = system.bootstrap_map(feats, TUM_FR2, cfg)
    assert int(state.lm_valid.sum()) == N - 10
