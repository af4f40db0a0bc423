"""Scale invariance: the image-pyramid frontend on forward motion.

ORB-SLAM3/pySLAM both run 8-level pyramids at factor 1.2
(`baselines/pyslam/scripts/setup.sh:69-70`); the reference's learned
frontend inherits scale handling from the ViT. These tests show the
production `extract_features` keeps tracking under zoom where a
single-scale frontend sheds matches (VERDICT r1 missing #5).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from semantic_slam_master_tpu.core.camera import TUM_FR2
from semantic_slam_master_tpu.data import synthetic
from semantic_slam_master_tpu.ops import image
from semantic_slam_master_tpu.slam import tracking

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)


@pytest.fixture(scope="module")
def zoom_features():
    """Forward motion toward the front wall: ~25-35% scale change between
    matched frames at spacing 4."""
    cam = TUM_FR2.scaled(0.5, 0.5)
    N = 36
    ts = np.arange(N) / 30.0
    poses = np.tile(np.eye(4), (N, 1, 1))
    poses[:, 2, 3] = np.linspace(-1.6, 0.6, N)
    seq = synthetic.SyntheticSequence(cam=cam, timestamps=ts, poses_wc=poses, seed=1)
    frames = seq.frames()
    gray = jnp.stack([image.rgb_to_gray(f["rgb"]) for f in frames])
    depth = jnp.stack([jnp.asarray(f["depth"]) for f in frames])
    sel = np.arange(0, N, 4)
    return seq, gray[sel], depth[sel]


def _success_rate(feats, cam, min_matches=50):
    """The reference's tracking-success criterion: >= 50 matches per step
    (`semantic-slam/test/test_tracking.py:159-161`)."""
    res = tracking.track_sequence(jax.random.PRNGKey(0), feats, cam)
    nm = np.asarray(res.num_matches)[1:]
    return (nm >= min_matches).mean(), nm


def test_pyramid_keeps_tracking_under_zoom(zoom_features):
    seq, gray, depth = zoom_features
    f1 = tracking.extract_features(gray, depth, num_keypoints=512, num_levels=1)
    f4 = tracking.extract_features(gray, depth, num_keypoints=512, num_levels=4)
    s1, nm1 = _success_rate(f1, seq.cam)
    s4, nm4 = _success_rate(f4, seq.cam)
    assert s4 >= 0.9, f"pyramid should keep tracking: {s4} ({nm4.tolist()})"
    assert s1 < s4 or nm4[-1] > 2 * nm1[-1], (
        f"single-scale should shed matches under zoom: "
        f"single={nm1.tolist()} pyramid={nm4.tolist()}"
    )
    # The late-zoom frames are where scale invariance pays.
    assert nm4[-2:].min() > 1.5 * nm1[-2:].min()


def test_pyramid_shapes_and_coords():
    cam = TUM_FR2.scaled(0.5, 0.5)
    seq = synthetic.make_sequence(num_frames=2, cam=cam)
    frames = seq.frames()
    gray = jnp.stack([image.rgb_to_gray(f["rgb"]) for f in frames])
    depth = jnp.stack([jnp.asarray(f["depth"]) for f in frames])
    feats = tracking.extract_features(gray, depth, num_keypoints=256, num_levels=4)
    # Fixed total K across levels; coords within level-0 bounds.
    assert feats.xy.shape == (2, 256, 2)
    H, W = gray.shape[1:]
    xy = np.asarray(feats.xy)[np.asarray(feats.valid)]
    assert (xy[:, 0] >= 0).all() and (xy[:, 0] <= W - 1).all()
    assert (xy[:, 1] >= 0).all() and (xy[:, 1] <= H - 1).all()
    pyr = tracking.build_pyramid(gray, 4)
    assert len(pyr) == 4
    assert all(p.shape[1] % 8 == 0 and p.shape[2] % 8 == 0 for p in pyr)
