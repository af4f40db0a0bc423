"""Semantics in the live SLAM loop: the fr3_walking mechanism.

The reference's distinguishing failure case is ORB-SLAM3 on
fr3_walking_xyz: rigidly-moving persons form a rival RANSAC consensus
and corrupt the trajectory to 0.4611 m ATE
(`/root/reference/experiments/baselines/orb_slam3/results.json:140`).
These tests reproduce that failure in the synthetic world (two moving
CLASS_PERSON slabs) and prove that semantic residual weighting — GT
labels or the trained SemanticSegmenter — recovers the trajectory.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from semantic_slam_master_tpu.data import synthetic
from semantic_slam_master_tpu.eval import ate_rpe
from semantic_slam_master_tpu.models import segmenter as seg_mod
from semantic_slam_master_tpu.ops import image
from semantic_slam_master_tpu.slam import system, tracking

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)


@pytest.fixture(scope="module")
def dynamic_scene():
    seq = synthetic.make_dynamic_sequence(num_frames=30, scale=0.5)
    frames = seq.frames()
    gray = jnp.stack([image.rgb_to_gray(f["rgb"]) for f in frames])
    depth = jnp.stack([jnp.asarray(f["depth"]) for f in frames])
    labels = jnp.stack([jnp.asarray(f["labels"]) for f in frames])
    return seq, gray, depth, labels


def _ate(seq, out) -> float:
    res = ate_rpe.evaluate_trajectory(
        np.asarray(seq.timestamps),
        np.asarray(seq.poses_wc),
        np.asarray(seq.timestamps),
        np.asarray(jax.device_get(out.poses_wc), dtype=np.float64),
    )
    return res["ate"]["rmse"]


def test_movers_render_and_move(dynamic_scene):
    seq, _, _, labels = dynamic_scene
    labels = np.asarray(labels)
    fracs = (labels == synthetic.CLASS_PERSON).mean(axis=(1, 2))
    # The persons are substantial mid-sequence but never fill the view.
    assert fracs.max() > 0.4
    assert fracs.max() < 0.9
    # And they MOVE: per-frame person centroids drift monotonically.
    cols = [
        np.argwhere(labels[i] == synthetic.CLASS_PERSON)[:, 1].mean()
        for i in (5, 12, 19)
    ]
    assert cols[0] != pytest.approx(cols[2], abs=2.0)


def test_semantic_weighting_rescues_dynamic_scene(dynamic_scene):
    """Unweighted SLAM is corrupted by the moving slabs; GT-semantic
    weighting recovers it — the north-star residual-weighting claim."""
    seq, gray, depth, labels = dynamic_scene
    wmap = seg_mod.class_weights_map(labels)
    feats_plain = tracking.extract_features(gray, depth, num_keypoints=512)
    feats_sem = tracking.extract_features(
        gray, depth, num_keypoints=512, weight_map=wmap
    )
    # sem_weight defaults to ones, and GT weighting down-weights persons.
    assert float(feats_plain.sem_weight.min()) == 1.0
    person_w = seg_mod.DEFAULT_CLASS_WEIGHTS[synthetic.CLASS_PERSON]
    assert float(feats_sem.sem_weight.min()) == pytest.approx(person_w)

    key = jax.random.PRNGKey(0)
    ate_plain = _ate(seq, system.run_slam(key, feats_plain, seq.cam))
    ate_sem = _ate(seq, system.run_slam(key, feats_sem, seq.cam))

    # Measured across RANSAC seeds: plain 0.05-0.20 m, semantic
    # 0.02-0.04 m. Assert the qualitative contract with slack.
    assert ate_sem < 0.05, f"semantic SLAM should stay accurate: {ate_sem}"
    assert ate_plain > 2.0 * ate_sem, (
        f"dynamic scene should corrupt unweighted SLAM: "
        f"plain={ate_plain:.4f} sem={ate_sem:.4f}"
    )


def test_static_scene_unaffected_by_semantic_path():
    """On a static scene, all-ones semantic weights change nothing."""
    seq = synthetic.make_sequence(num_frames=12, scale=0.5)
    frames = seq.frames()
    gray = jnp.stack([image.rgb_to_gray(f["rgb"]) for f in frames])
    depth = jnp.stack([jnp.asarray(f["depth"]) for f in frames])
    labels = jnp.stack([jnp.asarray(f["labels"]) for f in frames])
    wmap = seg_mod.class_weights_map(labels)
    # Static classes all carry weight 1.0 except CLASS_OTHER (absent here)
    feats = tracking.extract_features(gray, depth, num_keypoints=256, weight_map=wmap)
    key = jax.random.PRNGKey(0)
    ate = _ate(seq, system.run_slam(key, feats, seq.cam))
    assert ate < 0.05


def test_weighted_ransac_prefers_static_consensus():
    """Unit-level: with >50% of correspondences moving rigidly together,
    unweighted RANSAC elects the mover; weighted RANSAC elects the
    static world."""
    from semantic_slam_master_tpu.core.camera import TUM_FR2
    from semantic_slam_master_tpu.core import lie
    from semantic_slam_master_tpu.slam import pnp

    cam = TUM_FR2.scaled(0.5, 0.5)
    rng = np.random.default_rng(0)
    n_static, n_dyn = 80, 120
    pts_static = rng.uniform([-2, -1, 2], [2, 1, 5], size=(n_static, 3))
    pts_dyn = rng.uniform([-2, -1, 2], [2, 1, 5], size=(n_dyn, 3))

    # True camera motion: small rotation + translation.
    T_true = np.asarray(
        lie.se3_exp(jnp.asarray([0.05, -0.02, 0.03, 0.01, 0.02, -0.01]))
    )
    # The dynamic cluster ALSO translates in the world -> its apparent
    # motion differs from the camera's.
    d_shift = np.array([0.4, 0.0, 0.0])

    def cam_pts(T, pts):
        return pts @ T[:3, :3].T + T[:3, 3]

    pts1 = np.concatenate([pts_static, pts_dyn])
    pts2 = np.concatenate(
        [cam_pts(T_true, pts_static), cam_pts(T_true, pts_dyn + d_shift)]
    )
    from semantic_slam_master_tpu.core.camera import project

    obs2 = np.asarray(project(jnp.asarray(pts2), cam))
    valid = np.ones(n_static + n_dyn, bool)
    weights = np.concatenate(
        [np.ones(n_static), np.full(n_dyn, 0.05)]
    ).astype(np.float32)

    key = jax.random.PRNGKey(1)
    res_plain = pnp.ransac_pose(
        key, jnp.asarray(pts1), jnp.asarray(pts2), jnp.asarray(obs2),
        cam, jnp.asarray(valid),
    )
    res_w = pnp.ransac_pose(
        key, jnp.asarray(pts1), jnp.asarray(pts2), jnp.asarray(obs2),
        cam, jnp.asarray(valid), weights=jnp.asarray(weights),
    )

    def trans_err(T):
        return float(jnp.linalg.norm(T[:3, 3] - jnp.asarray(T_true[:3, 3])))

    # Unweighted: the 60% dynamic consensus wins -> pose off by ~the shift.
    assert trans_err(res_plain.pose) > 0.2
    # Weighted: static world wins -> accurate pose.
    assert trans_err(res_w.pose) < 0.05
