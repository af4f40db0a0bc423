"""Batched image primitives: grayscale, blur, Sobel, pooling, pyramids.

These replace the scattered torch/OpenCV image ops of the reference —
`F.conv2d` Sobel in the edge loss (`losses/self_supervised.py:252-254`),
`adaptive_avg_pool2d` downsampling (`:260`), torchvision resize/blur in
the dataset (`data/tum_dataset.py:88-107`) — with fixed-shape jnp that
fuses under jit. Layout is channels-last (B, H, W, C) or (B, H, W),
the natural TPU layout (last dim maps to lanes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.float32)
SOBEL_Y = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], dtype=np.float32)


def rgb_to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    """ITU-R 601 luma, the reference's convention (`self_supervised.py:248`).
    rgb: (..., 3) -> (...)."""
    w = jnp.asarray([0.299, 0.587, 0.114], dtype=rgb.dtype)
    return rgb @ w


def conv2d_single(img: jnp.ndarray, kernel: jnp.ndarray, padding: str = "SAME") -> jnp.ndarray:
    """2-D correlation of (B, H, W) with a (kh, kw) kernel."""
    x = img[:, :, :, None]
    k = jnp.asarray(kernel, dtype=img.dtype)[:, :, None, None]
    out = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out[:, :, :, 0]


def sobel_magnitude(gray: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Sobel gradient magnitude of (B, H, W), zero-padded borders —
    same operator as the edge-awareness loss (`self_supervised.py:252-254`)."""
    gx = conv2d_single(gray, SOBEL_X)
    gy = conv2d_single(gray, SOBEL_Y)
    return jnp.sqrt(gx * gx + gy * gy + eps)


def gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-(x**2) / (2.0 * sigma**2))
    return k / k.sum()


def shift2d(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Zero-padded shift of (B, H, W) expressed as pad+slice — a pure
    stencil read that XLA fuses into one pass (unlike jnp.roll, whose
    wraparound concatenation materializes a copy per shift)."""
    B, H, W = img.shape
    ay, ax = abs(dy), abs(dx)
    padded = jnp.pad(img, ((0, 0), (ay, ay), (ax, ax)))
    return jax.lax.dynamic_slice(padded, (0, ay - dy, ax - dx), (B, H, W))


def gaussian_blur(img: jnp.ndarray, sigma: float = 1.0, radius: int = 2) -> jnp.ndarray:
    """Separable Gaussian blur of (B, H, W) as a shift-add stencil.

    Border mode: zero-pad without kernel renormalization (negligible at
    these radii; keypoint margins exclude borders anyway). ~15 fused
    shifted adds beat a single-channel lax.conv on TPU by >10x — 1-channel
    convs cannot tile onto the MXU.
    """
    k = gaussian_kernel1d(sigma, radius)
    B, H, W = img.shape
    padded = jnp.pad(img, ((0, 0), (radius, radius), (0, 0)))
    out = sum(
        k[i] * jax.lax.dynamic_slice(padded, (0, i, 0), (B, H, W))
        for i in range(2 * radius + 1)
    )
    padded = jnp.pad(out, ((0, 0), (0, 0), (radius, radius)))
    return sum(
        k[i] * jax.lax.dynamic_slice(padded, (0, 0, i), (B, H, W))
        for i in range(2 * radius + 1)
    )


def avg_pool_to(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Adaptive average pooling of (B, H, W) to (B, out_h, out_w) for the
    integer-ratio case (448 -> 28), matching `F.adaptive_avg_pool2d`."""
    B, H, W = img.shape
    assert H % out_h == 0 and W % out_w == 0, "non-integer pooling ratio"
    fh, fw = H // out_h, W // out_w
    return img.reshape(B, out_h, fh, out_w, fw).mean(axis=(2, 4))


def max_pool_same(img: jnp.ndarray, radius: int) -> jnp.ndarray:
    """(2r+1)x(2r+1) max pooling with SAME padding over (B, H, W) — the NMS
    primitive (`keypoint_selector.py:209-225`)."""
    if radius == 0:
        return img
    k = 2 * radius + 1
    return jax.lax.reduce_window(
        img, -jnp.inf, jax.lax.max,
        window_dimensions=(1, k, k), window_strides=(1, 1, 1), padding="SAME",
    )


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize of (B, H, W[, C]) via jax.image (half-pixel centers)."""
    if img.ndim == 3:
        shape = (img.shape[0], out_h, out_w)
    else:
        shape = (img.shape[0], out_h, out_w, img.shape[-1])
    return jax.image.resize(img, shape, method="bilinear")


def build_pyramid(gray: jnp.ndarray, num_levels: int, scale: float = 1.2):
    """ORB-style image pyramid: level i is the input downscaled by
    ``scale**i`` (the reference's ORB extractors use scale 1.2 pyramids
    inside ORB-SLAM; SURVEY.md §2.2 "pySLAM cpp ORB extractor").

    Returns a list of (B, Hi, Wi) arrays (static shapes per level).
    """
    B, H, W = gray.shape
    levels = [gray]
    for i in range(1, num_levels):
        h = max(int(round(H / (scale**i))), 8)
        w = max(int(round(W / (scale**i))), 8)
        levels.append(resize_bilinear(gray, h, w))
    return levels
