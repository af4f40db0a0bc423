import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from semantic_slam_master_tpu.ops import sampling


def test_bilinear_matches_grid_sample(rng):
    """Bit-parity with the reference's grid_sample(align_corners=True)
    sampling (dino_backbone.py:134-147)."""
    B, H, W, C = 2, 28, 28, 16
    feats = rng.normal(size=(B, H, W, C)).astype(np.float32)
    kpts = rng.uniform(0, 27, size=(B, 50, 2)).astype(np.float32)

    ours = np.asarray(sampling.bilinear_sample(jnp.asarray(feats), jnp.asarray(kpts)))

    # reference path
    t_feats = torch.from_numpy(feats).permute(0, 3, 1, 2)  # (B,C,H,W)
    norm = torch.from_numpy(kpts.copy())
    norm[..., 0] = 2.0 * norm[..., 0] / (W - 1) - 1.0
    norm[..., 1] = 2.0 * norm[..., 1] / (H - 1) - 1.0
    grid = norm.unsqueeze(1)  # (B,1,N,2)
    ref = F.grid_sample(t_feats, grid, mode="bilinear", align_corners=True)
    ref = ref.squeeze(2).permute(0, 2, 1).numpy()  # (B,N,C)

    assert np.allclose(ours, ref, atol=1e-5)


def test_bilinear_exact_at_integer_coords(rng):
    feats = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
    xy = jnp.asarray([[[3.0, 5.0]]])
    out = np.asarray(sampling.bilinear_sample(jnp.asarray(feats), xy))
    assert np.allclose(out[0, 0], feats[0, 5, 3], atol=1e-6)


def test_nearest_sample(rng):
    img = rng.normal(size=(1, 10, 10)).astype(np.float32)
    xy = jnp.asarray([[[2.4, 7.6]]])
    out = np.asarray(sampling.nearest_sample(jnp.asarray(img), xy))
    assert np.isclose(out[0, 0], img[0, 8, 2])


def test_gather_patches(rng):
    img = rng.normal(size=(1, 20, 20)).astype(np.float32)
    centers = jnp.asarray([[[10.0, 8.0]]])
    patch = np.asarray(sampling.gather_patches(jnp.asarray(img), centers, 2))
    assert patch.shape == (1, 1, 5, 5)
    assert np.allclose(patch[0, 0], img[0, 6:11, 8:13])


def test_gather_patches_clamps_at_border(rng):
    img = rng.normal(size=(1, 20, 20)).astype(np.float32)
    centers = jnp.asarray([[[0.0, 0.0]]])
    patch = np.asarray(sampling.gather_patches(jnp.asarray(img), centers, 3))
    assert patch.shape == (1, 1, 7, 7)
    assert np.allclose(patch[0, 0], img[0, 0:7, 0:7])
