import numpy as np
import pytest
from PIL import Image

from semantic_slam_master_tpu.data import native_io


@pytest.fixture(scope="module")
def png_fixture(tmp_path_factory):
    """Write RGB8 and 16-bit depth PNGs like TUM's."""
    root = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    rgb_paths, depth_paths = [], []
    rgbs, depths = [], []
    for i in range(4):
        rgb = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
        depth = rng.integers(0, 30000, size=(48, 64), dtype=np.uint16)
        rp = root / f"rgb_{i}.png"
        dp = root / f"depth_{i}.png"
        Image.fromarray(rgb).save(rp)
        Image.fromarray(depth).save(dp)  # uint16 -> 16-bit grayscale PNG
        rgb_paths.append(rp)
        depth_paths.append(dp)
        rgbs.append(rgb)
        depths.append(depth)
    return rgb_paths, depth_paths, np.stack(rgbs), np.stack(depths)


def test_native_builds():
    assert native_io.ensure_built(), "g++/libpng build failed"
    assert native_io.available()


def test_png_info(png_fixture):
    rgb_paths, depth_paths, _, _ = png_fixture
    if not native_io.available():
        pytest.skip("native lib unavailable")
    w, h, c, b = native_io.png_info(rgb_paths[0])
    assert (w, h, c, b) == (64, 48, 3, 8)
    w, h, c, b = native_io.png_info(depth_paths[0])
    assert (w, h, c) == (64, 48, 1)
    assert b == 16


def test_load_batch_matches_pil(png_fixture):
    rgb_paths, depth_paths, rgbs, depths = png_fixture
    if not native_io.available():
        pytest.skip("native lib unavailable")
    rgb, depth = native_io.load_batch(
        rgb_paths, depth_paths, width=64, height=48, depth_scale=5000.0
    )
    assert rgb.shape == (4, 48, 64, 3)
    assert depth.shape == (4, 48, 64)
    assert np.allclose(rgb, rgbs.astype(np.float32) / 255.0, atol=1e-6)
    assert np.allclose(depth, depths.astype(np.float32) / 5000.0, atol=1e-6)


def test_load_batch_rgb_only(png_fixture):
    rgb_paths, _, rgbs, _ = png_fixture
    if not native_io.available():
        pytest.skip("native lib unavailable")
    rgb, depth = native_io.load_batch(rgb_paths, None, width=64, height=48)
    assert depth is None
    assert rgb.shape == (4, 48, 64, 3)


def test_load_batch_bad_file(tmp_path, png_fixture):
    if not native_io.available():
        pytest.skip("native lib unavailable")
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not a png")
    with pytest.raises(IOError):
        native_io.load_batch([bad], None, width=64, height=48)


def test_pil_fallback(png_fixture):
    rgb_paths, depth_paths, rgbs, depths = png_fixture
    rgb, depth = native_io._load_batch_pil(rgb_paths, depth_paths, 5000.0)
    assert np.allclose(rgb, rgbs.astype(np.float32) / 255.0, atol=1e-6)
    assert np.allclose(depth, depths.astype(np.float32) / 5000.0, atol=1e-6)
