"""Pallas kernel: keypoint patch extraction — a RECORDED NEGATIVE RESULT.

The ORB descriptor needs a 31x31 intensity patch around every keypoint
(`ops/orb.py`). XLA lowers the natural formulation — an elementwise
gather of B x N x 961 pixels — to a scalarized gather that dominates the
whole frontend (~65 ms for 8x1000 keypoints on a v5e core, >60% of the
pipeline). This kernel was the first attempt at fixing that: keep the
frame in HBM and cut each patch out with per-keypoint async DMA copies,
with keypoint coordinates delivered through scalar prefetch (SMEM) so
offsets are known before the body runs.

**Why it is not the production path.** It passes interpret-mode parity
tests, but Mosaic rejects it on real TPU hardware: DMA slice *starts*
(not just sizes) must be 8-aligned in the sublane dimension and
128-aligned in the lane dimension ("Failed to prove that a tile index
in dimension 1 is divisible by the tiling (8)"), and keypoint
coordinates are arbitrary pixels. Honoring the alignment means copying
a 40x160 superset per 31x31 patch (~10x traffic) plus an in-kernel
dynamic shift. Meanwhile the dense-moment-map + steered-matmul
formulation in `ops/orb.py` removed the per-keypoint gather from the
hot path entirely and is faster than this kernel could be even with
perfect DMA. Kept (with its tests) as documentation of the approach and
of the Mosaic constraint; `ops.sampling.gather_patches` is the portable
production fallback.
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
