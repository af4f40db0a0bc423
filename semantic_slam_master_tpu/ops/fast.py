"""FAST corner detection as fixed-shape batched XLA ops.

TPU-native replacement for the ORB extractor's FAST stage that the
reference gets from compiled C++ (`orbslam2_features` in
`baselines/pyslam/scripts/setup.sh:69-70`; ORB-SLAM3's own extractor,
SURVEY.md §2.2). The segment test is evaluated for *every* pixel at once
on the VPU — no early-exit scalar loop, which is exactly the right trade
on TPU: 16 shifted copies + O(16) boolean ops beat branchy code.

Design notes
------------
- The circle neighbourhood is materialized with `jnp.roll` (16 shifted
  views); borders are invalidated by a margin mask instead of padding.
- Contiguous-arc-of-9 test: AND-reduce 9 consecutive circle positions
  for all 16 rotations via a two-level decomposition (AND of 3 ANDs of 3)
  — 64 boolean ops per polarity instead of 144.
- Corner score: sum over the circle of |I_p - I_i| - t for positions that
  pass the polarity test (the OpenCV/ORB-SLAM "sum of absolute diff over
  the arc" ranking score, computed circle-wide; equal ranking behaviour
  for NMS purposes).
- Keypoint extraction is fixed-K: NMS -> masked top-k + validity mask
  (SURVEY.md §7.3 — no data-dependent shapes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.fixed import masked_topk
from .image import max_pool_same

# Bresenham circle of radius 3, clockwise from 12 o'clock: (dy, dx).
FAST_CIRCLE = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    dtype=np.int32,
)

BORDER_MARGIN = 3


def _circle_stack(gray: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) -> (16, B, H, W) of circle-neighbour intensities.

    Implemented as ONE zero-pad + 16 static slices — a stencil XLA fuses
    into a single pass over the image (jnp.roll's wraparound would
    materialize 16 copies). Borders are invalid (zero neighbours) and are
    masked by the caller's >= 3 px margin.
    """
    B, H, W = gray.shape
    r = BORDER_MARGIN
    padded = jnp.pad(gray, ((0, 0), (r, r), (r, r)))
    views = [
        jax.lax.dynamic_slice(padded, (0, r + int(dy), r + int(dx)), (B, H, W))
        for dy, dx in FAST_CIRCLE
    ]
    return jnp.stack(views, axis=0)


def _arc9_any(bits: jnp.ndarray) -> jnp.ndarray:
    """True where any 9 contiguous of the 16 circle bits are set.

    bits: (16, ...) bool. Two-level AND decomposition over the doubled
    (wrap-around) sequence.
    """
    # Double the circular axis once; all shifted reads become static
    # slices (views) that fuse, instead of per-shift roll copies.
    d = jnp.concatenate([bits, bits], axis=0)
    c3 = d[:24] & d[1:25] & d[2:26]  # c3[i] = AND of bits[i..i+2]
    c9 = c3[:16] & c3[3:19] & c3[6:22]  # c9[i] = AND of bits[i..i+8]
    return jnp.any(c9, axis=0)


def fast_score(gray: jnp.ndarray, threshold: float = 0.08) -> jnp.ndarray:
    """FAST-9 corner response for every pixel of (B, H, W) in [0, 1] gray.

    Returns (B, H, W) float32; zero where the segment test fails.

    On TPU, frames that fit VMEM take the single-pass Pallas kernel
    (`ops/pallas/fast_score.py` — measured 0.182 -> ~0.01 ms/frame at
    640x480; the XLA stencil materializes the 16-neighbour stack in HBM).
    Values agree up to f32 summation order of the 16 margin terms; the
    XLA path below stays the portable/parity reference.
    """
    if jax.default_backend() == "tpu":
        from .pallas.fast_score import fast_score_pallas, fits_vmem

        B, H, W = gray.shape
        if fits_vmem(H, W):
            return fast_score_pallas(gray, float(threshold))
    return fast_score_xla(gray, threshold)


def fast_score_xla(gray: jnp.ndarray, threshold: float = 0.08) -> jnp.ndarray:
    """The portable XLA stencil formulation (parity reference)."""
    circle = _circle_stack(gray)
    center = gray[None]
    diff = circle - center
    brighter = diff > threshold
    darker = diff < -threshold

    is_bright = _arc9_any(brighter)
    is_dark = _arc9_any(darker)
    is_corner = is_bright | is_dark

    # Ranking score: sum of margins beyond threshold for the winning
    # polarity, evaluated over the full circle (VPU-cheap, monotone in
    # corner strength).
    bright_score = jnp.sum(jnp.maximum(diff - threshold, 0.0), axis=0)
    dark_score = jnp.sum(jnp.maximum(-diff - threshold, 0.0), axis=0)
    score = jnp.where(is_bright, bright_score, 0.0) + jnp.where(
        is_dark, dark_score, 0.0
    )
    return jnp.where(is_corner, score, 0.0)


def _border_mask(h: int, w: int, margin: int) -> jnp.ndarray:
    ys = jnp.arange(h)
    xs = jnp.arange(w)
    my = (ys >= margin) & (ys < h - margin)
    mx = (xs >= margin) & (xs < w - margin)
    return my[:, None] & mx[None, :]


class Keypoints(NamedTuple):
    """Fixed-K keypoint set for a batch of images.

    xy:    (B, K, 2) float32 pixel coordinates (x, y)
    score: (B, K) float32 detector response
    valid: (B, K) bool — False slots repeat the best keypoint
    """

    xy: jnp.ndarray
    score: jnp.ndarray
    valid: jnp.ndarray


def refine_subpixel(score_map: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Sub-pixel keypoint positions by separable parabolic fit on the
    detector response (TPU-build extension; integer-grid positions are
    the reference baselines' behaviour).

    For each keypoint, fit a 1-D parabola through the response at
    (x-1, x, x+1) (and likewise in y) and move to its apex, clamped to
    +/-0.5 px. The NMS guarantees the centre is a local max, so the
    curvature is non-positive; degenerate (flat) fits keep the integer
    position. Descriptor sampling still rounds to the pixel grid
    (`orb.describe`), so this sharpens only the *geometric* coordinates
    that PnP/triangulation/BA consume.

    score_map: (B, H, W) raw detector response (pre-NMS).
    xy: (B, N, 2) integer-valued float pixel coords.
    Returns refined (B, N, 2) float coords.
    """
    from .sampling import nearest_sample

    def axis_offset(sm, sc, sp):
        denom = sm + sp - 2.0 * sc
        off = jnp.where(denom < -1e-12, (sm - sp) / (2.0 * denom), 0.0)
        return jnp.clip(off, -0.5, 0.5)

    e = jnp.asarray([1.0, 0.0], xy.dtype)
    n = jnp.asarray([0.0, 1.0], xy.dtype)
    sc = nearest_sample(score_map, xy)
    dx = axis_offset(
        nearest_sample(score_map, xy - e), sc, nearest_sample(score_map, xy + e)
    )
    dy = axis_offset(
        nearest_sample(score_map, xy - n), sc, nearest_sample(score_map, xy + n)
    )
    return xy + jnp.stack([dx, dy], axis=-1)


def detect(
    gray: jnp.ndarray,
    num_keypoints: int,
    threshold: float = 0.08,
    nms_radius: int = 3,
    margin: int = 16,
    subpixel: bool = False,
    score_weight: jnp.ndarray | None = None,
) -> Keypoints:
    """FAST keypoints with NMS and fixed-K top-k selection.

    ``margin`` should cover the descriptor patch radius (ORB uses 31x31
    patches -> margin >= 16 keeps descriptor sampling in-bounds).
    ``subpixel`` applies `refine_subpixel` to the returned coordinates.
    ``score_weight`` (B, H, W) multiplies the corner scores BEFORE NMS
    and top-k, steering the fixed keypoint budget away from down-weighted
    (e.g. dynamic-class) pixels; sub-pixel refinement still fits the RAW
    corner response so the weight steps at class boundaries cannot bias
    keypoint geometry.
    """
    B, H, W = gray.shape
    score = fast_score(gray, threshold)
    raw_score = score
    if score_weight is not None:
        score = score * score_weight
    # NMS with LEXICOGRAPHIC (score, index) tie-breaking: keep local
    # maxima, and among exact-score ties within one NMS window keep only
    # the highest flat index. Exact ties happen on textured plateaus, and
    # an additive dither is unsound (round-2 advisor: an index*1e-9 step
    # is below the f32 ulp of typical scores, so tied same-row neighbours
    # both survived and the block-sum recovery below fabricated a rounded
    # centroid keypoint between them). Two tied pixels inside one window
    # see each other symmetrically (each bounds the other's pooled max),
    # so a second max-pool over the tied pixels' indices makes exactly
    # one of them dominate — survivors are strictly > all neighbours in
    # (score, index) order. Indices < 2^24 are exact in f32.
    pooled = max_pool_same(score, nms_radius)
    is_tied = (score >= pooled) & (score > 0.0)
    idx_f = jnp.broadcast_to(
        jnp.arange(H * W, dtype=jnp.float32).reshape(1, H, W), (B, H, W)
    )
    tied_idx = jnp.where(is_tied, idx_f, -1.0)
    pooled_idx = max_pool_same(tied_idx, nms_radius)
    score = jnp.where(is_tied & (idx_f >= pooled_idx), score, 0.0)
    mask = (score > 0.0) & _border_mask(H, W, max(margin, BORDER_MARGIN))[None]
    masked = jnp.where(mask, score.reshape(B, H, W), 0.0)

    if H % 4 == 0 and W % 4 == 0 and nms_radius >= 3:
        # MXU block reduction: NMS radius >= 3 forces survivors >= 4 px
        # apart (lexicographic NMS leaves at most one survivor per tie
        # group), so every 4x4 block holds AT
        # MOST ONE survivor — block "reduction" is therefore a SUM, and
        # block sums are two one-hot matmuls that ride the MXU. The
        # survivor's exact coordinates come from two more weighted block
        # sums (sum(v*x)/sum(v) with a single nonzero = its position).
        # This replaces per-block lax.top_k / iterative argmax, both of
        # which are cross-lane reduction sweeps measured at ~1.6 ms per
        # 8-frame 640x480 batch — more than the whole segment test.
        Sy = (
            (jnp.arange(H // 4)[:, None] * 4 + jnp.arange(4)[None, :])
        )  # (H/4, 4) row indices per block row
        Py = jnp.zeros((H // 4, H), jnp.float32).at[
            jnp.repeat(jnp.arange(H // 4), 4), Sy.reshape(-1)
        ].set(1.0)
        Px = jnp.zeros((W, W // 4), jnp.float32).at[
            (jnp.arange(W // 4)[:, None] * 4 + jnp.arange(4)[None, :]).reshape(-1),
            jnp.repeat(jnp.arange(W // 4), 4),
        ].set(1.0)
        xs_w = jnp.arange(W, dtype=jnp.float32)[None, None, :]
        ys_w = jnp.arange(H, dtype=jnp.float32)[None, :, None]

        def block_sum(m):
            return jnp.einsum(
                "hH,bHW,Ww->bhw", Py, m, Px, preferred_element_type=jnp.float32
            )

        val = block_sum(masked)  # (B, H/4, W/4)
        sx = block_sum(masked * xs_w)
        sy = block_sum(masked * ys_w)
        safe = jnp.maximum(val, 1e-20)
        bx = jnp.round(sx / safe).astype(jnp.int32)
        by = jnp.round(sy / safe).astype(jnp.int32)
        nb = (H // 4) * (W // 4)
        cand_val = val.reshape(B, nb)
        cand_idx = jnp.clip(by * W + bx, 0, H * W - 1).reshape(B, nb)
        values, sel, valid = masked_topk(cand_val, cand_val > 0.0, num_keypoints)
        indices = jnp.take_along_axis(cand_idx, sel, axis=-1)
    else:
        flat_score = masked.reshape(B, H * W)
        values, indices, valid = masked_topk(
            flat_score, flat_score > 0.0, num_keypoints
        )
    ys = (indices // W).astype(jnp.float32)
    xs = (indices % W).astype(jnp.float32)
    xy = jnp.stack([xs, ys], axis=-1)
    if subpixel:
        xy = refine_subpixel(raw_score, xy)
    return Keypoints(xy=xy, score=values, valid=valid)
