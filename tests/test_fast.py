import jax.numpy as jnp
import numpy as np

from semantic_slam_master_tpu.ops import fast, image


def _numpy_fast9(gray: np.ndarray, threshold: float) -> np.ndarray:
    """Direct scalar transcription of the FAST-9 segment test."""
    H, W = gray.shape
    is_corner = np.zeros((H, W), dtype=bool)
    circle = fast.FAST_CIRCLE
    for y in range(3, H - 3):
        for x in range(3, W - 3):
            c = gray[y, x]
            vals = np.array([gray[y + dy, x + dx] for dy, dx in circle])
            for polarity in (1, -1):
                bits = (polarity * (vals - c)) > threshold
                doubled = np.concatenate([bits, bits])
                run = 0
                best = 0
                for b in doubled:
                    run = run + 1 if b else 0
                    best = max(best, run)
                if best >= 9:
                    is_corner[y, x] = True
                    break
    return is_corner


def test_fast_segment_test_matches_numpy(rng):
    gray = rng.uniform(size=(24, 32)).astype(np.float32)
    ref = _numpy_fast9(gray, 0.15)
    score = np.asarray(fast.fast_score(jnp.asarray(gray)[None], 0.15))[0]
    ours = score > 0
    # compare interior only (rolls wrap at borders)
    assert np.array_equal(ours[3:-3, 3:-3], ref[3:-3, 3:-3])


def test_detects_synthetic_corner():
    """A bright square on dark background has corners at its 4 vertices."""
    img = np.zeros((64, 64), dtype=np.float32)
    img[24:40, 24:40] = 1.0
    kp = fast.detect(jnp.asarray(img)[None], num_keypoints=8, threshold=0.2, margin=4)
    xy = np.asarray(kp.xy)[0][np.asarray(kp.valid)[0]]
    assert len(xy) >= 4
    corners = np.array([[24, 24], [39, 24], [24, 39], [39, 39]])
    for c in corners:
        d = np.linalg.norm(xy - c, axis=1).min()
        assert d <= 2.0, (c, xy)


def test_detect_fixed_shapes():
    img = jnp.zeros((2, 48, 48))  # featureless -> no corners
    kp = fast.detect(img, num_keypoints=100, margin=4)
    assert kp.xy.shape == (2, 100, 2)
    assert kp.score.shape == (2, 100)
    assert not np.asarray(kp.valid).any()


def test_detect_on_textured_image(rng):
    from semantic_slam_master_tpu.data import synthetic

    seq = synthetic.make_sequence(num_frames=1, scale=0.5)
    gray = image.rgb_to_gray(jnp.asarray(seq.frame(0)["rgb"])[None])
    kp = fast.detect(gray, num_keypoints=300, threshold=0.05)
    valid = np.asarray(kp.valid)[0]
    assert valid.sum() > 150  # checkerboard texture yields plenty of corners
    xy = np.asarray(kp.xy)[0][valid]
    # margin respected
    assert xy[:, 0].min() >= 16 and xy[:, 1].min() >= 16


