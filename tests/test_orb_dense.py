"""Parity tests for the dense-moment / direct-gather ORB path."""

import jax.numpy as jnp
import numpy as np

from semantic_slam_master_tpu.ops import image, orb, sampling


def test_dense_moments_match_patch_moments(rng):
    """Dense disc-moment maps sampled at interior points == patch-based
    moments (exact same disc weights)."""
    img = jnp.asarray(rng.uniform(size=(2, 96, 128)).astype(np.float32))
    xy = jnp.asarray(rng.uniform(32, 64, size=(2, 20, 2)).astype(np.float32))

    theta_patch = orb.orientations(img, xy)
    theta_dense = orb.orientations_dense(img, xy)
    assert np.allclose(np.asarray(theta_patch), np.asarray(theta_dense), atol=1e-3)


def test_describe_direct_matches_patch_path(rng):
    img = jnp.asarray(rng.uniform(size=(2, 96, 128)).astype(np.float32))
    xy = jnp.asarray(
        np.round(rng.uniform(32, 64, size=(2, 16, 2))).astype(np.float32)
    )
    theta = orb.orientations(img, xy)
    d_direct = orb.describe(img, xy, theta=theta, prefiltered=True)
    patches = sampling.gather_patches(img, xy, orb.PATCH_RADIUS)
    d_patch = orb.describe_from_patches(patches, theta=theta)
    assert np.array_equal(np.asarray(d_direct), np.asarray(d_patch))


def test_describe_from_padded_patches(rng):
    """32x32 padded patches (Pallas layout) give identical descriptors."""
    img = jnp.asarray(rng.uniform(size=(1, 96, 128)).astype(np.float32))
    xy = jnp.asarray(np.round(rng.uniform(32, 64, size=(1, 8, 2))).astype(np.float32))
    theta = orb.orientations(img, xy)
    p31 = sampling.gather_patches(img, xy, 15)
    p32 = jnp.pad(p31, ((0, 0), (0, 0), (0, 1), (0, 1)))
    d31 = orb.describe_from_patches(p31, theta=theta)
    d32 = orb.describe_from_patches(p32, theta=theta)
    assert np.array_equal(np.asarray(d31), np.asarray(d32))
