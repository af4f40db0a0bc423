"""Gather-based sampling: bilinear interpolation at keypoints, patch gather.

Replaces `torch.nn.functional.grid_sample` as used by the reference's
feature extraction (`models/dino_backbone.py:143-147`, bilinear,
align_corners=True) with explicit gathers — on TPU a vector gather of
four corners + lerp fuses cleanly and avoids the normalized-coordinate
indirection entirely.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(
    grid: jnp.ndarray, xy: jnp.ndarray
) -> jnp.ndarray:
    """Sample (B, H, W, C) feature grids at (B, N, 2) float (x, y) coords.

    Coordinates are in grid units ([0, W-1] x [0, H-1]) — equivalent to
    grid_sample(..., align_corners=True) after the reference's [-1, 1]
    normalization (`dino_backbone.py:134-136`). Out-of-range coordinates
    clamp to the border.

    Returns (B, N, C).
    """
    B, H, W, C = grid.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.0)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.0)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2) if W > 1 else jnp.zeros_like(x, jnp.int32)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2) if H > 1 else jnp.zeros_like(y, jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1
    wx = (x - x0.astype(x.dtype))[..., None]
    wy = (y - y0.astype(y.dtype))[..., None]

    flat = grid.reshape(B, H * W, C)

    def gather(yy, xx):
        idx = yy * W + xx  # (B, N)
        return jnp.take_along_axis(flat, idx[..., None], axis=1)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def nearest_sample(grid: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour sampling of (B, H, W[, C]) at (B, N, 2) coords.

    Single-channel grids gather along the MINOR axis of a (B, H*W)
    view: `take_along_axis` along a non-minor axis (the (B, HW, 1) form)
    scalarizes on TPU — measured ~32 ms for 8x1000 depth lookups on a
    640x480 frame vs sub-ms for the minor-axis form."""
    squeeze = grid.ndim == 3
    if squeeze:
        grid = grid[..., None]
    B, H, W, C = grid.shape
    x = jnp.clip(jnp.round(xy[..., 0]).astype(jnp.int32), 0, W - 1)
    y = jnp.clip(jnp.round(xy[..., 1]).astype(jnp.int32), 0, H - 1)
    idx = y * W + x  # (B, N)
    if C == 1:
        out = jnp.take_along_axis(grid.reshape(B, H * W), idx, axis=-1)[..., None]
    else:
        out = jnp.take_along_axis(grid.reshape(B, H * W, C), idx[..., None], axis=1)
    return out[..., 0] if squeeze else out


def gather_patches(
    img: jnp.ndarray, centers: jnp.ndarray, radius: int
) -> jnp.ndarray:
    """Gather square patches around integer keypoint centers.

    img: (B, H, W); centers: (B, N, 2) float (x, y), rounded to ints;
    returns (B, N, 2r+1, 2r+1). Patches are clamped at borders (callers
    keep keypoints >= radius from the border via the detector margin).

    This XLA formulation is the production path on every backend. A
    Pallas per-keypoint-DMA alternative exists in ``ops.pallas.patches``
    but is a RECORDED NEGATIVE RESULT on real TPUs: Mosaic requires DMA
    slice starts to be 8-aligned in the sublane dim and 128-aligned in
    the lane dim ("Failed to prove that a tile index ... is divisible by
    the tiling"), and keypoint coordinates are arbitrary — honoring the
    alignment means over-copying ~10x per patch, at which point the
    dense-moment-map + matmul formulation in ``ops.orb`` (which removed
    this gather from the hot path entirely) is strictly better. The
    kernel stays as interpret-mode documentation of the approach.
    """
    B, H, W = img.shape
    k = 2 * radius + 1
    cx = jnp.clip(jnp.round(centers[..., 0]).astype(jnp.int32), radius, W - 1 - radius)
    cy = jnp.clip(jnp.round(centers[..., 1]).astype(jnp.int32), radius, H - 1 - radius)
    dy = jnp.arange(-radius, radius + 1)
    dx = jnp.arange(-radius, radius + 1)
    yy = cy[..., None, None] + dy[None, None, :, None]  # (B, N, k, 1)
    xx = cx[..., None, None] + dx[None, None, None, :]  # (B, N, 1, k)
    idx = (yy * W + xx).reshape(B, -1)  # (B, N*k*k)
    flat = img.reshape(B, H * W)
    out = jnp.take_along_axis(flat, idx, axis=1)
    return out.reshape(B, centers.shape[1], k, k)
