"""Correctness tests for Pallas kernels (interpret mode on CPU; the same
code compiles with Mosaic on TPU)."""

import jax.numpy as jnp
import numpy as np

from semantic_slam_master_tpu.ops import sampling
from semantic_slam_master_tpu.ops.pallas import patches as ppatches


def test_patch_kernel_matches_reference(rng):
    B, H, W, N = 2, 64, 128, 16
    img = jnp.asarray(rng.normal(size=(B, H, W)).astype(np.float32))
    centers = jnp.asarray(
        rng.uniform(17, 47, size=(B, N, 2)).astype(np.float32)
    )
    ref = sampling.gather_patches(img, centers, 15)
    out = ppatches.gather_patches_pallas(img, centers, 15, interpret=True)
    assert out.shape == (B, N, 32, 32)
    assert np.allclose(np.asarray(out)[..., :31, :31], np.asarray(ref))


def test_patch_kernel_border_clamp(rng):
    """Out-of-bounds centers clamp; padded copy stays in-bounds and the
    31x31 prefix equals the reference at the (tighter) clamped center."""
    B, H, W, N = 1, 48, 128, 8
    img = jnp.asarray(rng.normal(size=(B, H, W)).astype(np.float32))
    centers = jnp.asarray(
        [[[0.0, 0.0], [127.0, 47.0], [-5.0, 20.0], [60.0, 100.0],
          [20.0, 16.0], [110.0, 31.0], [64.0, 0.0], [0.0, 47.0]]]
    )
    out = np.asarray(
        ppatches.gather_patches_pallas(img, centers, 15, interpret=True)
    )
    # pallas clamps bottom/right 1 px tighter (padded copy); emulate
    cx = np.clip(np.round(np.asarray(centers)[..., 0]), 15, W - 17)
    cy = np.clip(np.round(np.asarray(centers)[..., 1]), 15, H - 17)
    clamped = jnp.asarray(np.stack([cx, cy], axis=-1).astype(np.float32))
    ref = np.asarray(sampling.gather_patches(img, clamped, 15))
    assert np.allclose(out[..., :31, :31], ref)


def test_patch_kernel_group_fallback(rng):
    """N not divisible by group -> group=1 path."""
    B, H, W, N = 1, 64, 128, 7
    img = jnp.asarray(rng.normal(size=(B, H, W)).astype(np.float32))
    centers = jnp.asarray(rng.uniform(20, 40, size=(B, N, 2)).astype(np.float32))
    ref = sampling.gather_patches(img, centers, 15)
    out = ppatches.gather_patches_pallas(img, centers, 15, interpret=True)
    assert np.allclose(np.asarray(out)[..., :31, :31], np.asarray(ref))


def test_aligned_patch_kernel_matches_direct_slice(rng):
    """gather_aligned_patches (aligned-superset DMA + dynamic roll)
    centres the keypoint at (15, 15) exactly, including the bottom/right
    clamp region."""
    B, H, W, N = 2, 48, 256, 8
    img = jnp.asarray(rng.normal(size=(B, H, W)).astype(np.float32))
    xy = jnp.asarray(
        [[[20.0, 20.0], [16.0, 16.0], [237.0, 30.0], [120.0, 16.0],
          [200.0, 30.0], [30.0, 16.0], [237.0, 30.0], [100.0, 24.0]]] * B
    )
    out = np.asarray(ppatches.gather_aligned_patches(img, xy, interpret=True))
    im = np.asarray(img)
    for b in range(B):
        for n in range(N):
            cx = int(np.clip(round(float(xy[b, n, 0])), 15, W - 18))
            cy = int(np.clip(round(float(xy[b, n, 1])), 15, H - 17))
            ref = im[b, cy - 15 : cy + 17, cx - 15 : cx + 17]
            assert np.array_equal(out[b, n], ref), (b, n)
