"""Oriented-BRIEF (ORB) descriptors as batched fixed-shape XLA ops.

TPU-native equivalent of the rBRIEF stage of the reference's C++ ORB
extractors (ORB-SLAM3 core and pySLAM's `orbslam2_features`; SURVEY.md
§2.2). Pipeline per keypoint:

1. intensity-centroid orientation over a radius-15 circular patch
   (Rublee et al. 2011, the ORB paper),
2. rotate the 256 BRIEF test-point pairs by the (bin-discretized)
   orientation — 30 bins of 12 deg, matching ORB's discretization,
3. compare blurred-image intensities at the rotated test points,
4. pack the 256 bits into 8 x uint32 words.

The BRIEF test pattern is a deterministic Gaussian pattern (sigma =
patch/5, the original BRIEF G-II construction) generated from a fixed
seed rather than OpenCV's learned `bit_pattern_31_` table: descriptors
are self-consistent across frames (which is what matching quality needs)
while containing no copied table. Steering + packing semantics mirror
ORB so downstream Hamming matching behaves identically.

Everything is (B, N, ...)-batched; the hot path is gathers + elementwise
compares on the VPU and runs entirely under jit.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .image import gaussian_blur
from .sampling import gather_patches

PATCH_RADIUS = 15  # ORB's 31x31 patch
NUM_BITS = 256
NUM_WORDS = NUM_BITS // 32
NUM_ANGLE_BINS = 30  # ORB discretizes steering to 2*pi/30


def make_test_pattern(seed: int = 7) -> np.ndarray:
    """(256, 4) int8 pattern of (x_a, y_a, x_b, y_b) BRIEF test pairs.

    Gaussian(0, (patch/5)^2) samples clipped to the 31x31 patch — the
    isotropic construction from the BRIEF paper. Deterministic in seed.
    """
    rng = np.random.default_rng(seed)
    sigma = (2 * PATCH_RADIUS + 1) / 5.0
    pts = rng.normal(0.0, sigma, size=(NUM_BITS, 4))
    # Keep every test point inside a radius-(PATCH_RADIUS-2) disc so any
    # discretized rotation stays within the gathered patch.
    max_r = PATCH_RADIUS - 2
    pts = np.clip(pts, -max_r / np.sqrt(2), max_r / np.sqrt(2))
    return np.round(pts).astype(np.int8)


_DEFAULT_PATTERN = make_test_pattern()


def _orientation_weights() -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Circular-disc x/y moment weights for the intensity centroid."""
    r = PATCH_RADIUS
    ys, xs = np.mgrid[-r : r + 1, -r : r + 1]
    disc = (xs**2 + ys**2) <= r**2
    return (
        (xs * disc).astype(np.float32),
        (ys * disc).astype(np.float32),
        disc.astype(np.float32),
    )


_WX, _WY, _DISC = _orientation_weights()


def orientations_from_patches(patches: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation from gathered patches (B, N, 31, 31).

    theta = atan2(m01, m10) with m10 = sum x*I, m01 = sum y*I over the
    circular 31x31 patch (ORB paper eq. 2-3). The moment sums are one
    (B*N, 961) x (961, 2) matmul — MXU work, not reductions.
    """
    B, N = patches.shape[:2]
    w = jnp.stack([jnp.asarray(_WX).ravel(), jnp.asarray(_WY).ravel()], axis=-1)
    m = patches.reshape(B, N, -1) @ w  # (B, N, 2)
    return jnp.arctan2(m[..., 1], m[..., 0])


def orientations(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation per keypoint (gathers patches;
    prefer :func:`orientations_from_patches` when patches are shared
    with descriptor extraction)."""
    return orientations_from_patches(gather_patches(img, xy, PATCH_RADIUS))


def _disc_extents(radius: int) -> np.ndarray:
    """Half-width of the disc at each |dy| (ORB's umax table)."""
    dys = np.arange(0, radius + 1)
    return np.floor(np.sqrt(radius**2 - dys**2 + 1e-9)).astype(np.int32)


def dense_moment_maps(img: jnp.ndarray, radius: int = PATCH_RADIUS):
    """Dense intensity-centroid moment maps m10(x, y), m01(x, y) over the
    circular disc, for every pixel at once.

    Incremental-extent stencil decomposition: horizontal weighted sums
    T_e = sum_{dx=-e..e} dx * shift_x(I), U_e = sum shift_x(I) are built
    cumulatively (2 ops per extent), then combined vertically with the
    disc's per-row extents — ~190 fused shift-adds total instead of a
    961-tap 2-D convolution. This turns per-keypoint orientation into two
    cheap map lookups (the per-keypoint 961-pixel patch gather was >60%
    of frontend time on TPU).

    Zero-padded borders: values within ``radius`` of the edge are not
    disc-exact; keypoint margins (>= 16) keep consumers in the valid
    region. Returns (m10, m01), each (B, H, W).
    """
    from .image import shift2d

    extents = _disc_extents(radius)
    need = sorted(set(int(e) for e in extents))
    T: dict = {}
    U: dict = {}
    t = img * 0.0
    u = img
    if 0 in need:
        T[0], U[0] = t, u
    for e in range(1, radius + 1):
        t = t + float(e) * (shift2d(img, 0, -e) - shift2d(img, 0, e))
        u = u + shift2d(img, 0, -e) + shift2d(img, 0, e)
        if e in need:
            T[e], U[e] = t, u
    # NOTE shift2d(img, 0, -e)[y, x] = img[y, x + e] (content moves left).
    m10 = T[int(extents[0])]
    m01 = U[int(extents[0])] * 0.0
    for dy in range(1, radius + 1):
        e = int(extents[dy])
        up = shift2d(T[e], -dy, 0)  # row y + dy
        down = shift2d(T[e], dy, 0)  # row y - dy
        m10 = m10 + up + down
        m01 = m01 + float(dy) * (shift2d(U[e], -dy, 0) - shift2d(U[e], dy, 0))
    return m10, m01


def orientations_dense(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Per-keypoint orientation by sampling dense moment maps (exact disc
    moments away from borders; == patch-based orientation there)."""
    from .sampling import nearest_sample

    m10, m01 = dense_moment_maps(img)
    return jnp.arctan2(nearest_sample(m01, xy), nearest_sample(m10, xy))


def _steered_pattern_bank(pattern: np.ndarray) -> np.ndarray:
    """Precompute the rotated integer test pattern for all angle bins.

    Returns (NUM_ANGLE_BINS, 256, 4) float32 offsets — ORB rounds the
    rotated pattern once per bin, not per keypoint.
    """
    bank = np.zeros((NUM_ANGLE_BINS, NUM_BITS, 4), dtype=np.float32)
    for b in range(NUM_ANGLE_BINS):
        theta = 2.0 * np.pi * b / NUM_ANGLE_BINS
        c, s = np.cos(theta), np.sin(theta)
        xa, ya, xb, yb = pattern[:, 0], pattern[:, 1], pattern[:, 2], pattern[:, 3]
        bank[b, :, 0] = np.round(c * xa - s * ya)
        bank[b, :, 1] = np.round(s * xa + c * ya)
        bank[b, :, 2] = np.round(c * xb - s * yb)
        bank[b, :, 3] = np.round(s * xb + c * yb)
    return bank


_PATTERN_BANK = _steered_pattern_bank(_DEFAULT_PATTERN)


def describe(
    img: jnp.ndarray,
    xy: jnp.ndarray,
    theta: jnp.ndarray | None = None,
    blur_sigma: float = 2.0,
    prefiltered: bool = False,
) -> jnp.ndarray:
    """rBRIEF descriptors.

    img: (B, H, W) gray in [0, 1]; xy: (B, N, 2); theta: (B, N) radians
    (computed from the intensity centroid when None).
    Returns packed (B, N, 8) uint32 descriptors.
    """
    if not prefiltered:
        img = gaussian_blur(img, sigma=blur_sigma, radius=3)
    if theta is None:
        # Dense disc-moment maps + two lookups — replaces the per-keypoint
        # 961-pixel patch gather that dominated frontend time on TPU.
        theta = orientations_dense(img, xy)

    offs = _steered_offsets(theta)  # (B, N, 256, 4)

    # Sample the 2x256 test points straight from the (blurred) image with
    # one flat gather — half the gathered elements of the patch approach
    # and no intermediate patch tensor.
    B, H, W = img.shape
    r = PATCH_RADIUS
    cx = jnp.clip(jnp.round(xy[..., 0]).astype(jnp.int32), r, W - 1 - r)
    cy = jnp.clip(jnp.round(xy[..., 1]).astype(jnp.int32), r, H - 1 - r)
    ax = cx[..., None] + offs[..., 0].astype(jnp.int32)
    ay = cy[..., None] + offs[..., 1].astype(jnp.int32)
    bx = cx[..., None] + offs[..., 2].astype(jnp.int32)
    by = cy[..., None] + offs[..., 3].astype(jnp.int32)
    flat = img.reshape(B, H * W)
    N = xy.shape[1]
    idx = jnp.concatenate(
        [(ay * W + ax).reshape(B, N * NUM_BITS), (by * W + bx).reshape(B, N * NUM_BITS)],
        axis=1,
    )
    vals = jnp.take_along_axis(flat, idx, axis=1)
    ia = vals[:, : N * NUM_BITS].reshape(B, N, NUM_BITS)
    ib = vals[:, N * NUM_BITS :].reshape(B, N, NUM_BITS)
    bits = (ia < ib).astype(jnp.uint32)  # (B, N, 256)
    return pack_bits(bits)


def _steered_offsets(theta: jnp.ndarray) -> jnp.ndarray:
    """Per-keypoint rotated test offsets from the precomputed bin bank."""
    two_pi = 2.0 * jnp.pi
    ang = jnp.mod(theta, two_pi)
    bins = jnp.clip(
        jnp.round(ang / (two_pi / NUM_ANGLE_BINS)).astype(jnp.int32),
        0,
        NUM_ANGLE_BINS,
    ) % NUM_ANGLE_BINS  # (B, N)
    bank = jnp.asarray(_PATTERN_BANK)  # (30, 256, 4)
    return bank[bins]


def describe_from_patches(
    patches: jnp.ndarray, theta: jnp.ndarray | None = None
) -> jnp.ndarray:
    """rBRIEF from pre-gathered (B, N, >=31, >=31) patches — the
    patch-space variant (used with the Pallas patch kernel and as the
    parity reference for the direct-gather path in `describe`)."""
    if theta is None:
        theta = orientations_from_patches(patches[..., :31, :31])
    offs = _steered_offsets(theta)
    ps = patches.shape[-1]
    pa = (offs[..., 1] + PATCH_RADIUS) * ps + (offs[..., 0] + PATCH_RADIUS)
    pb = (offs[..., 3] + PATCH_RADIUS) * ps + (offs[..., 2] + PATCH_RADIUS)
    flat = patches.reshape(*patches.shape[:2], -1)
    ia = jnp.take_along_axis(flat, pa.astype(jnp.int32), axis=-1)
    ib = jnp.take_along_axis(flat, pb.astype(jnp.int32), axis=-1)
    return pack_bits((ia < ib).astype(jnp.uint32))


def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """(B, N, 256) {0,1} -> packed (B, N, 8) uint32 (bit i of word w =
    test index w*32 + i)."""
    B, N, _ = bits.shape
    words = bits.reshape(B, N, NUM_WORDS, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(words << shifts, axis=-1, dtype=jnp.uint32)


def unpack_bits(desc: jnp.ndarray) -> jnp.ndarray:
    """Packed (..., 8) uint32 -> (..., 256) {0,1} uint32 bits."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[..., None] >> shifts) & jnp.uint32(1)
    return bits.reshape(*desc.shape[:-1], NUM_BITS)


def to_signs(desc: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Packed descriptors -> ±1 vectors (..., 256) for MXU Hamming matmul."""
    bits = unpack_bits(desc).astype(jnp.float32)
    return (2.0 * bits - 1.0).astype(dtype)
