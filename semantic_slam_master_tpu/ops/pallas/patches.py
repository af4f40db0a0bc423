"""Pallas kernel: keypoint patch extraction.

The ORB descriptor needs a 31x31 intensity patch around every keypoint
(`ops/orb.py`). XLA lowers the natural formulation — an elementwise
gather of B x N x 961 pixels — to a scalarized gather that dominates the
whole frontend (~65 ms for 8x1000 keypoints on a v5e core, >60% of the
pipeline). The Pallas version keeps the frame resident in VMEM and cuts
each patch out with per-keypoint async DMA copies (DMA engines allow the
arbitrary offsets that vector loads do not), with keypoint coordinates
delivered through scalar prefetch (SMEM) so offsets are known before the
body runs.

Constraints shape the design:
- DMA slice sizes must be 8-aligned in the sublane dim -> patches are
  copied as 32x32 (PATCH_PAD); consumers index only the 31x31 prefix.
- Grid: (B, N / G) with G copies in flight per step; the image block's
  index map ignores the keypoint axis, so Mosaic keeps the frame in VMEM
  across all steps of a batch row.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PATCH_PAD = 32  # DMA-aligned patch side (>= 2*radius+1, multiple of 8)


def _patch_kernel(coords_ref, img_ref, out_ref, sems, *, radius: int, group: int):
    # Vector loads require 8/128-aligned starts and VMEM is (8,128)-tiled,
    # so the frame stays in HBM (linear layout, img_ref is the FULL array)
    # and each patch is an async HBM->VMEM DMA at its exact offset, all G
    # in flight at once.
    ks = PATCH_PAD
    b = pl.program_id(0)
    c = pl.program_id(1)
    copies = []
    for g in range(group):  # static unroll: G overlapping DMAs
        n = c * group + g
        x = coords_ref[b, n, 0]
        y = coords_ref[b, n, 1]
        dma = pltpu.make_async_copy(
            img_ref.at[b, pl.ds(y - radius, ks), pl.ds(x - radius, ks)],
            out_ref.at[0, g],
            sems.at[g],
        )
        dma.start()
        copies.append(dma)
    for dma in copies:
        dma.wait()


@functools.partial(jax.jit, static_argnames=("radius", "group", "interpret"))
def gather_patches_pallas(
    img: jnp.ndarray,
    centers: jnp.ndarray,
    radius: int = 15,
    group: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """img (B, H, W) f32, centers (B, N, 2) float (x, y) ->
    (B, N, 32, 32) patches whose [..., :2r+1, :2r+1] prefix matches
    ops.sampling.gather_patches (borders clamped ~1 px tighter on the
    bottom/right to keep the padded copy in-bounds; detector margins are
    >= 16 px so real keypoints are unaffected)."""
    B, H, W = img.shape
    N = centers.shape[1]
    ks = PATCH_PAD
    assert 2 * radius + 1 <= ks
    if N % group != 0:
        group = 1
    cx = jnp.clip(
        jnp.round(centers[..., 0]).astype(jnp.int32), radius, W - (ks - radius)
    )
    cy = jnp.clip(
        jnp.round(centers[..., 1]).astype(jnp.int32), radius, H - (ks - radius)
    )
    coords = jnp.stack([cx, cy], axis=-1)  # (B, N, 2) int32

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, N // group),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # frame stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, group, ks, ks), lambda b, c, coords: (b, c, 0, 0)
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((group,))],
    )
    return pl.pallas_call(
        functools.partial(_patch_kernel, radius=radius, group=group),
        out_shape=jax.ShapeDtypeStruct((B, N, ks, ks), img.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(coords, img)
