"""Bit-parity tests for the matmul-structured descriptor path."""

import jax.numpy as jnp
import numpy as np

from semantic_slam_master_tpu.ops import orb


def _img(rng, B=2, H=96, W=128):
    return jnp.asarray(rng.uniform(size=(B, H, W)).astype(np.float32))


def test_matmul_path_bit_exact_vs_gather(rng):
    img = _img(rng)
    xy = jnp.asarray(
        np.round(rng.uniform(20, 90, size=(2, 24, 2))).astype(np.float32)
    )
    theta = orb.orientations(img, xy)
    d_gather = orb.describe_gather(img, xy, theta=theta, prefiltered=True)
    d_matmul = orb.describe_matmul(img, xy, theta=theta, prefiltered=True)
    assert np.array_equal(np.asarray(d_gather), np.asarray(d_matmul))


def test_matmul_path_subpixel_coords(rng):
    """Non-integer coordinates round identically in both paths."""
    img = _img(rng)
    xy = jnp.asarray(rng.uniform(20, 90, size=(2, 16, 2)).astype(np.float32))
    theta = orb.orientations(img, xy)
    d_g = orb.describe_gather(img, xy, theta=theta, prefiltered=True)
    d_m = orb.describe_matmul(img, xy, theta=theta, prefiltered=True)
    assert np.array_equal(np.asarray(d_g), np.asarray(d_m))


def test_matmul_path_block_boundaries(rng):
    """Keypoints straddling 32-column block boundaries."""
    img = _img(rng, B=1, H=64, W=160)
    xs = [17.0, 31.0, 32.0, 33.0, 47.0, 63.0, 64.0, 95.0, 96.0, 127.0, 130.0, 141.0]
    xy = jnp.asarray([[[x, 32.0] for x in xs]])
    theta = orb.orientations(img, xy)
    d_g = orb.describe_gather(img, xy, theta=theta, prefiltered=True)
    d_m = orb.describe_matmul(img, xy, theta=theta, prefiltered=True)
    assert np.array_equal(np.asarray(d_g), np.asarray(d_m))


def test_describe_dispatch(rng):
    """describe() uses the matmul path for 32-aligned widths and the
    gather path otherwise; both must work."""
    img_aligned = _img(rng, W=128)
    img_odd = _img(rng, W=130)
    xy = jnp.asarray(np.round(rng.uniform(25, 90, size=(2, 8, 2))).astype(np.float32))
    d1 = orb.describe(img_aligned, xy, prefiltered=True)
    d2 = orb.describe(img_odd, xy, prefiltered=True)
    assert d1.shape == d2.shape == (2, 8, 8)


def test_matmul_matches_full_describe_pipeline(rng):
    """End-to-end describe() (dense orientation + matmul bits) equals the
    gather pipeline with the same orientation."""
    img = _img(rng)
    xy = jnp.asarray(np.round(rng.uniform(20, 90, size=(2, 12, 2))).astype(np.float32))
    d_fast = orb.describe(img, xy, prefiltered=True)
    d_ref = orb.describe_gather(img, xy, prefiltered=True)
    assert np.array_equal(np.asarray(d_fast), np.asarray(d_ref))
