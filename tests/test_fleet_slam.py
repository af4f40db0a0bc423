"""Fleet SLAM: sequences sharded one-per-device (slam/parallel.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_slam_master_tpu.core.camera import TUM_FR2
from semantic_slam_master_tpu.parallel import mesh as mesh_lib
from semantic_slam_master_tpu.slam import parallel as fleet
from semantic_slam_master_tpu.slam import system
from semantic_slam_master_tpu.slam.tracking import FrameFeatures


def _fake_features(key, S, F, N=64):
    """Deterministic synthetic per-frame features (no rendering): a
    static cloud of 3D points projected under a slowly-translating
    camera, with ORB-like random packed descriptors that persist across
    frames so the map can associate them."""
    rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 1 << 30)))
    cam = TUM_FR2
    feats = []
    for s in range(S):
        pts = np.stack(
            [
                rng.uniform(-1.5, 1.5, N),
                rng.uniform(-1.0, 1.0, N),
                rng.uniform(2.0, 5.0, N),
            ],
            axis=-1,
        )
        desc = rng.integers(0, np.iinfo(np.uint32).max, (N, 8), dtype=np.uint32)
        xs, ds, zs, vs = [], [], [], []
        for f in range(F):
            t = np.array([0.02 * f * (s + 1), 0.0, 0.0])
            p = pts - t  # camera translates +x -> points move -x in cam
            uv = np.stack(
                [
                    cam.fx * p[:, 0] / p[:, 2] + cam.cx,
                    cam.fy * p[:, 1] / p[:, 2] + cam.cy,
                ],
                axis=-1,
            )
            inb = (
                (uv[:, 0] > 20) & (uv[:, 0] < cam.width - 20)
                & (uv[:, 1] > 20) & (uv[:, 1] < cam.height - 20)
            )
            xs.append(uv)
            ds.append(desc)
            zs.append(p[:, 2])
            vs.append(inb)
        feats.append(
            FrameFeatures(
                xy=np.stack(xs),
                desc=np.stack(ds),
                depth=np.stack(zs),
                valid=np.stack(vs),
                score=np.ones((F, N), np.float32),
                sem_weight=np.ones((F, N), np.float32),
            )
        )
    return jax.tree.map(
        lambda *x: jnp.asarray(np.stack(x).astype(np.asarray(x[0]).dtype)), *feats
    )


def test_fleet_matches_sequential():
    S, F = 8, 6
    feats = _fake_features(jax.random.PRNGKey(0), S, F)
    keys = jax.random.split(jax.random.PRNGKey(1), S)
    cfg = system.SlamConfig(num_landmarks=128, num_hypotheses=16, min_inliers=8)
    m = mesh_lib.make_mesh()
    out_fleet = fleet.run_slam_fleet(keys, feats, TUM_FR2, cfg, m)
    assert out_fleet.poses_wc.shape == (S, F, 4, 4)

    for s in (0, 3, 7):
        f_s = jax.tree.map(lambda x: x[s], feats)
        out_s = system.run_slam(keys[s], f_s, TUM_FR2, cfg)
        np.testing.assert_allclose(
            np.asarray(out_fleet.poses_wc[s]),
            np.asarray(out_s.poses_wc),
            atol=1e-5,
        )
    # each sequence's recovered motion is the +x translation it was given
    p = np.asarray(out_fleet.poses_wc)
    for s in range(S):
        dx = p[s, -1, 0, 3] - p[s, 0, 0, 3]
        assert dx > 0.0, f"sequence {s} did not move +x"


def test_fleet_requires_divisible_sequences():
    feats = _fake_features(jax.random.PRNGKey(0), 3, 4)
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    m = mesh_lib.make_mesh()
    if m.shape["data"] == 1:
        pytest.skip("single-device mesh divides everything")
    with pytest.raises(AssertionError):
        fleet.run_slam_fleet(
            keys, feats, TUM_FR2, system.SlamConfig(num_landmarks=128), m
        )
