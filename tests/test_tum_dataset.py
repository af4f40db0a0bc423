import numpy as np
import pytest
from PIL import Image

from semantic_slam_master_tpu.data import tum


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory):
    """A miniature on-disk TUM sequence (timestamp-named PNGs + GT)."""
    root = tmp_path_factory.mktemp("tum") / "rgbd_dataset_freiburg1_fake"
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir()
    rng = np.random.default_rng(0)
    n = 6
    for i in range(n):
        ts = 1305031102.0 + i * 0.033
        rgb = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
        depth = rng.integers(1000, 20000, size=(48, 64), dtype=np.uint16)
        Image.fromarray(rgb).save(root / "rgb" / f"{ts:.6f}.png")
        Image.fromarray(depth).save(root / "depth" / f"{ts:.6f}.png")
    with open(root / "groundtruth.txt", "w") as f:
        f.write("# ground truth trajectory\n")
        for i in range(n * 2):  # GT at 2x frame rate
            ts = 1305031101.99 + i * 0.0165
            f.write(f"{ts:.6f} {0.01*i:.4f} 0.0 0.0 0.0 0.0 0.0 1.0\n")
    return root


def test_sequence_loads(tum_dir):
    from semantic_slam_master_tpu.core.camera import TUM_FR1

    seq = tum.TUMSequence(tum_dir, camera=TUM_FR1._replace(width=64, height=48))
    assert seq.num_frames() == 6
    assert len(seq) == 5  # pairs with spacing 1
    f = seq.frame(0)
    assert f["rgb"].shape == (48, 64, 3)
    assert 0.0 <= f["rgb"].min() and f["rgb"].max() <= 1.0
    assert f["depth"].shape == (48, 64)
    assert f["depth"].max() <= 20000 / 5000.0
    assert "pose_wc" in f


def test_gt_association_nearest(tum_dir):
    from semantic_slam_master_tpu.core.camera import TUM_FR1

    seq = tum.TUMSequence(tum_dir, camera=TUM_FR1._replace(width=64, height=48))
    # frame timestamps fall between GT samples; x grows 0.01/GT step
    x0 = seq.poses[0][0, 3]
    x1 = seq.poses[1][0, 3]
    assert x1 > x0  # later frame associated with later GT pose


def test_pair_keys_and_relative_pose(tum_dir):
    from semantic_slam_master_tpu.core.camera import TUM_FR1

    seq = tum.TUMSequence(
        tum_dir, input_size=32, camera=TUM_FR1._replace(width=64, height=48)
    )
    pair = seq.pair(0)
    for key in ("rgb1", "rgb2", "depth1", "depth2", "timestamp1", "timestamp2",
                "pose1", "pose2", "relative_pose"):
        assert key in pair, key
    assert pair["rgb1"].shape == (32, 32, 3)
    assert pair["depth1"].shape == (32, 32)
    expected = pair["pose2"] @ np.linalg.inv(pair["pose1"])
    assert np.allclose(pair["relative_pose"], expected, atol=1e-5)


def test_pair_augmentation_seeded(tum_dir):
    from semantic_slam_master_tpu.core.camera import TUM_FR1

    seq = tum.TUMSequence(
        tum_dir, input_size=32,
        augmentation=tum.AugmentationConfig(enabled=True),
        camera=TUM_FR1._replace(width=64, height=48),
    )
    p1 = seq.pair(0, seed=123)
    p2 = seq.pair(0, seed=123)
    p3 = seq.pair(0, seed=456)
    assert np.allclose(p1["rgb1"], p2["rgb1"])  # deterministic in seed
    assert not np.allclose(p1["rgb1"], p3["rgb1"])  # seed changes photometrics
    # depth untouched by augmentation
    assert np.allclose(p1["depth1"], p3["depth1"])


def test_load_all_gray_depth_native(tum_dir):
    from semantic_slam_master_tpu.core.camera import TUM_FR1

    seq = tum.TUMSequence(tum_dir, camera=TUM_FR1._replace(width=64, height=48))
    gray, depth = seq.load_all_gray_depth()
    assert gray.shape == (6, 48, 64)
    assert depth.shape == (6, 48, 64)
    # cross-check against the PIL per-frame path
    f0 = seq.frame(0)
    g0 = 0.299 * f0["rgb"][..., 0] + 0.587 * f0["rgb"][..., 1] + 0.114 * f0["rgb"][..., 2]
    assert np.allclose(gray[0], g0, atol=1e-5)
    assert np.allclose(depth[0], f0["depth"], atol=1e-6)


def test_imagenet_normalize_roundtrip():
    rgb = np.random.default_rng(0).uniform(size=(8, 8, 3)).astype(np.float32)
    out = tum.imagenet_normalize(rgb)
    back = out * tum.IMAGENET_STD + tum.IMAGENET_MEAN
    assert np.allclose(back, rgb, atol=1e-6)
