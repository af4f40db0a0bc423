"""The learned frontend driving the full SLAM backend.

The reference trains a learned frontend but never connects it to a SLAM
system (full SLAM was delegated to C++ baselines, SURVEY.md §3.4). Here
the SAME fixed-shape scan backend runs on either packed-bit ORB (Hamming
matching) or learned float descriptors (cosine matching) — dispatch on
descriptor dtype in `slam.system.match_features`.
"""

import pytest

import numpy as np
import jax
import jax.numpy as jnp

from semantic_slam_master_tpu.data import synthetic
from semantic_slam_master_tpu.models import frontend as fe
from semantic_slam_master_tpu.ops import matching
from semantic_slam_master_tpu.slam import system, tracking

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)


def test_match_features_dispatch():
    cfg = system.SlamConfig()
    # uint32 -> Hamming
    d1 = jnp.zeros((4, 8), jnp.uint32)
    d2 = jnp.zeros((6, 8), jnp.uint32)
    m = system.match_features(d1, d2, jnp.ones(4, bool), jnp.ones(6, bool), cfg)
    assert m.idx2.shape == (4,)
    # float (L2-normalized) -> cosine with the min-similarity gate
    f1 = jnp.eye(4, 16)
    f2 = jnp.concatenate([jnp.eye(2, 16), -jnp.eye(2, 16)], axis=0)
    m = system.match_features(f1, f2, jnp.ones(4, bool), jnp.ones(4, bool), cfg)
    assert bool(m.valid[0]) and bool(m.valid[1])  # identical rows match
    assert not bool(m.valid[2]) and not bool(m.valid[3])  # anti-aligned fail gate


def test_learned_frontend_drives_slam():
    """An (untrained) LearnedFrontend produces a finite trajectory through
    the full map/PnP/BA backend — the structural contract of VERDICT item
    3; accuracy comes from training (see test_seg_training / train CLIs)."""
    seq = synthetic.make_sequence(num_frames=8, scale=0.2)  # 128x96, /16 ok
    frames = seq.frames()
    rgb = jnp.stack([jnp.asarray(f["rgb"]) for f in frames])
    depth = jnp.stack([jnp.asarray(f["depth"]) for f in frames])

    model = fe.tiny_frontend(num_keypoints=128)
    variables = model.init(jax.random.PRNGKey(0), rgb[:1])
    feats = tracking.extract_learned_features(model, variables, rgb, depth)

    assert feats.desc.dtype == jnp.float32
    assert int(feats.valid.sum()) > 0
    # Confidence head output is consumed as sem_weight (runtime wiring of
    # the uncertainty estimator).
    assert float(feats.sem_weight.min()) >= 0.0
    assert float(feats.sem_weight.max()) <= 1.0

    cfg = system.SlamConfig(num_landmarks=512, match_min_cosine=0.5, min_inliers=10)
    out = system.run_slam(jax.random.PRNGKey(0), feats, seq.cam, cfg)
    poses = np.asarray(jax.device_get(out.poses_wc))
    assert np.isfinite(poses).all()
    assert int(np.asarray(out.num_matches)[1:].sum()) > 0
    # Map state holds float descriptors of the learned dimensionality.
    st = system.init_map(cfg, desc_dim=feats.desc.shape[-1], desc_dtype=feats.desc.dtype)
    assert st.descriptors.shape == (512, feats.desc.shape[-1])
    assert st.descriptors.dtype == jnp.float32
