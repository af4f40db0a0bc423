import pytest

import jax
import jax.numpy as jnp
import numpy as np

from semantic_slam_master_tpu.data import synthetic
from semantic_slam_master_tpu.eval import ate_rpe
from semantic_slam_master_tpu.ops import image
from semantic_slam_master_tpu.slam import tracking

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)


def _sequence_features(num_frames=10, scale=0.5, num_keypoints=400):
    seq = synthetic.make_sequence(num_frames=num_frames, scale=scale)
    frames = seq.frames()
    gray = jnp.stack(
        [image.rgb_to_gray(jnp.asarray(f["rgb"])) for f in frames]
    )
    depth = jnp.stack([jnp.asarray(f["depth"]) for f in frames])
    feats = tracking.extract_features(gray, depth, num_keypoints=num_keypoints)
    return seq, feats


def test_extract_features_shapes():
    seq, feats = _sequence_features(num_frames=3, scale=0.25, num_keypoints=200)
    assert feats.xy.shape == (3, 200, 2)
    assert feats.desc.shape == (3, 200, 8)
    assert feats.depth.shape == (3, 200)
    assert np.asarray(feats.valid).sum(axis=1).min() > 50


def test_vo_on_synthetic_sequence():
    """Frame-to-frame VO must recover the synthetic trajectory to cm-level
    ATE over a short sequence."""
    seq, feats = _sequence_features(num_frames=10, scale=0.5)
    result = tracking.track_sequence(jax.random.PRNGKey(0), feats, seq.cam)

    assert result.poses_wc.shape == (10, 4, 4)
    n_inl = np.asarray(result.num_inliers)[1:]
    assert n_inl.min() > 20, n_inl

    ate = ate_rpe.compute_ate(seq.poses_wc, np.asarray(result.poses_wc, dtype=np.float64))
    assert ate["rmse"] < 0.03, ate


def test_vo_jit_and_deterministic():
    seq, feats = _sequence_features(num_frames=4, scale=0.25, num_keypoints=200)
    f = jax.jit(lambda k, ft: tracking.track_sequence(k, ft, seq.cam))
    r1 = f(jax.random.PRNGKey(1), feats)
    r2 = f(jax.random.PRNGKey(1), feats)
    assert np.allclose(np.asarray(r1.poses_wc), np.asarray(r2.poses_wc))


def test_vo_failure_fallback():
    """Featureless frames: tracking falls back to constant position
    instead of diverging."""
    gray = jnp.zeros((3, 120, 160))
    depth = jnp.ones((3, 120, 160))
    feats = tracking.extract_features(gray, depth, num_keypoints=100)
    result = tracking.track_sequence(jax.random.PRNGKey(0), feats,
                                     synthetic.make_sequence(1, scale=0.25).cam)
    assert np.allclose(np.asarray(result.poses_wc), np.eye(4)[None])
    assert np.all(np.isfinite(np.asarray(result.poses_wc)))
