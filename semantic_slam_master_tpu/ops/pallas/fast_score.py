"""Pallas kernel: FAST-9 corner response in one pass over the frame.

The XLA formulation (`ops/fast.fast_score`) is a 16-point stencil — 16
shifted compares, two arc-9 boolean reductions, two margin-sum scores.
XLA materializes the (16, B, H, W) neighbour stack and a pile of mask
intermediates in HBM: measured 0.182 ms/frame at 640x480 (~120 HBM
passes) where the roofline is read-once + write-once (~3 us). This
kernel streams each frame through VMEM once and keeps every intermediate
in registers/VMEM:

- grid over frames; each step holds the whole (H, W) level in VMEM
  (<= 1.3 MB at 640x480 f32 — far under the 16 MB VMEM budget; the
  wrapper falls back to the XLA path for frames that would not fit);
- the 16 circle neighbours are static `pltpu.roll`s (7 sublane rolls
  shared across the circle's dy groups + one lane roll per point);
  wraparound corrupts only a 3-px border ring, which the detector's
  >= 16 px margin masks anyway (`fast.detect`);
- the two contiguous-arc-of-9 tests BIT-PACK the 16 polarity bits into
  one uint32 plane: with d = w | (w << 16) (the doubled circular
  sequence), c3 = d & (d>>1) & (d>>2), c9 = c3 & (c3>>3) & (c3>>6),
  "some arc of 9 is set" = (c9 & 0xffff) != 0 — eight integer ops on one
  plane instead of 2x16 boolean planes (which would not fit VMEM);
- scores accumulate sequentially in i (deterministic f32 order).

Parity with the XLA path: identical up to f32 summation order of the
16 margin terms (XLA may tree-reduce; this kernel accumulates in circle
order) and the wrapped 3-px border ring — `tests/test_pallas_kernels.py`
pins value agreement and identical NMS survivors away from the margin.

Reference behaviour being accelerated: the FAST stage of ORB extraction
(ORB-SLAM3 core; pySLAM `orbslam2_features`,
`baselines/pyslam/scripts/setup.sh:69-70` — SURVEY.md §2.2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import numpy as np

# Bresenham circle of radius 3, clockwise from 12 o'clock: (dy, dx).
# (Kept in sync with ops.fast.FAST_CIRCLE; asserted in the wrapper.)
_CIRCLE = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    dtype=np.int32,
)


def _arc9_word(word: jnp.ndarray) -> jnp.ndarray:
    """(H, W) uint32 of 16 circle bits -> nonzero where any 9 contiguous
    (circularly) bits are set."""
    d = word | (word << 16)  # doubled circular sequence in bits 0..31
    c3 = d & (d >> 1) & (d >> 2)
    c9 = c3 & (c3 >> 3) & (c3 >> 6)
    return c9 & jnp.uint32(0xFFFF)


def _fast_kernel(img_ref, out_ref, *, threshold: float, H: int, W: int):
    g = img_ref[0]  # (H, W) f32
    t = jnp.float32(threshold)

    word_b = jnp.zeros((H, W), jnp.uint32)
    word_d = jnp.zeros((H, W), jnp.uint32)
    bright = jnp.zeros((H, W), jnp.float32)
    dark = jnp.zeros((H, W), jnp.float32)

    # Group the circle by dy so each sublane roll is shared.
    by_dy: dict = {}
    for i, (dy, dx) in enumerate(_CIRCLE):
        by_dy.setdefault(int(dy), []).append((i, int(dx)))

    for dy, group in by_dy.items():
        gdy = pltpu.roll(g, (H - dy) % H, 0) if dy else g
        for i, dx in group:
            nb = pltpu.roll(gdy, (W - dx) % W, 1) if dx else gdy
            diff = nb - g
            word_b |= (diff > t).astype(jnp.uint32) << i
            word_d |= (diff < -t).astype(jnp.uint32) << i
            bright += jnp.maximum(diff - t, 0.0)
            dark += jnp.maximum(-diff - t, 0.0)

    is_b = _arc9_word(word_b) != 0
    is_d = _arc9_word(word_d) != 0
    score = jnp.where(is_b, bright, 0.0) + jnp.where(is_d, dark, 0.0)
    out_ref[0] = jnp.where(is_b | is_d, score, 0.0)


# VMEM budget: in + out blocks are double-buffered by the pipeline, plus
# kernel temporaries (~6 planes). Stay well under the 16 MB arena.
_MAX_VMEM_PLANE = 2_000_000  # elements (f32) per (H, W) plane


@functools.partial(jax.jit, static_argnames=("threshold", "interpret"))
def fast_score_pallas(
    img: jnp.ndarray, threshold: float, interpret: bool = False
) -> jnp.ndarray:
    """(B, H, W) f32 in [0, 1] -> (B, H, W) f32 FAST-9 response.

    Pads W to a lane multiple (128) and H to a sublane multiple (8) so
    `pltpu.roll` sees aligned planes; the pad ring only corrupts scores
    within 3 px of the pad seam, inside the detector's margin mask.
    """
    B, H, W = img.shape
    Hp = H + ((-H) % 8)
    Wp = W + ((-W) % 128)
    if (Hp, Wp) != (H, W):
        img = jnp.pad(img, ((0, 0), (0, Hp - H), (0, Wp - W)))
    out = pl.pallas_call(
        functools.partial(_fast_kernel, threshold=threshold, H=Hp, W=Wp),
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp), jnp.float32),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, Hp, Wp), lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, Hp, Wp), lambda b: (b, 0, 0)),
        interpret=interpret,
    )(img)
    return out[:, :H, :W]


def fits_vmem(H: int, W: int) -> bool:
    Hp = H + ((-H) % 8)
    Wp = W + ((-W) % 128)
    return Hp * Wp <= _MAX_VMEM_PLANE
