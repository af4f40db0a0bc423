import jax.numpy as jnp
import numpy as np

from semantic_slam_master_tpu.ops import image


def test_rgb_to_gray():
    rgb = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 8, 8, 3)).astype(np.float32))
    gray = image.rgb_to_gray(rgb)
    ref = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    assert np.allclose(gray, ref, atol=1e-6)


def test_sobel_matches_manual(rng):
    img = jnp.asarray(rng.uniform(size=(1, 16, 16)).astype(np.float32))
    mag = np.asarray(image.sobel_magnitude(img))[0]
    x = np.asarray(img)[0]
    # manual correlation at an interior pixel
    i, j = 7, 9
    patch = x[i - 1 : i + 2, j - 1 : j + 2]
    gx = (patch * image.SOBEL_X).sum()
    gy = (patch * image.SOBEL_Y).sum()
    assert np.isclose(mag[i, j], np.sqrt(gx**2 + gy**2 + 1e-8), atol=1e-5)


def test_gaussian_blur_preserves_mean(rng):
    img = jnp.asarray(rng.uniform(size=(1, 32, 32)).astype(np.float32))
    out = image.gaussian_blur(img, sigma=1.0, radius=2)
    # interior mean approx preserved (borders zero-padded)
    assert np.isclose(
        np.asarray(out)[0, 4:-4, 4:-4].mean(),
        np.asarray(img)[0, 4:-4, 4:-4].mean(),
        atol=0.01,
    )


def test_avg_pool_to():
    img = jnp.arange(16.0).reshape(1, 4, 4)
    out = image.avg_pool_to(img, 2, 2)
    assert np.allclose(np.asarray(out)[0], [[2.5, 4.5], [10.5, 12.5]])


def test_max_pool_same():
    img = jnp.zeros((1, 5, 5)).at[0, 2, 2].set(1.0)
    out = image.max_pool_same(img, 1)
    assert np.asarray(out)[0, 1:4, 1:4].min() == 1.0
    assert np.asarray(out)[0, 0, 0] == 0.0


def test_pyramid_shapes():
    img = jnp.zeros((2, 120, 160))
    pyr = image.build_pyramid(img, 4, scale=1.2)
    assert len(pyr) == 4
    assert pyr[0].shape == (2, 120, 160)
    assert pyr[1].shape == (2, 100, 133)
    for p in pyr[1:]:
        assert p.shape[1] < 120
