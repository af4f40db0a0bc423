import numpy as np
import pytest
from PIL import Image

from semantic_slam_master_tpu.data import prefetch


def test_prefetch_preserves_order_and_values():
    batches = [{"x": np.full((4,), i, np.float32)} for i in range(7)]
    out = list(prefetch.prefetch(iter(batches), buffer_size=2))
    assert len(out) == 7
    for i, b in enumerate(out):
        assert np.allclose(np.asarray(b["x"]), i)


def test_prefetch_propagates_errors():
    def gen():
        yield {"x": np.zeros(2)}
        raise ValueError("decode failed")

    it = prefetch.prefetch(gen(), buffer_size=1)
    next(it)
    with pytest.raises(ValueError, match="decode failed"):
        list(it)


def test_frame_chunks(tmp_path):
    rng = np.random.default_rng(0)
    rgb_paths, depth_paths = [], []
    for i in range(5):
        rgb = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
        depth = rng.integers(100, 20000, size=(24, 32), dtype=np.uint16)
        rp, dp = tmp_path / f"r{i}.png", tmp_path / f"d{i}.png"
        Image.fromarray(rgb).save(rp)
        Image.fromarray(depth).save(dp)
        rgb_paths.append(rp)
        depth_paths.append(dp)

    chunks = list(
        prefetch.frame_chunks(
            rgb_paths, depth_paths, chunk=2, width=32, height=24
        )
    )
    assert len(chunks) == 3
    assert chunks[0]["gray"].shape == (2, 24, 32)
    assert chunks[0]["depth"].shape == (2, 24, 32)
    assert int(chunks[-1]["count"]) == 1  # padded tail
    # padded frame repeats the last real one
    tail = np.asarray(chunks[-1]["gray"])
    assert np.allclose(tail[0], tail[1])
