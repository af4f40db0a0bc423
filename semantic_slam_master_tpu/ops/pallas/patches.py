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
            pl.BlockSpec(memory_space=pl.ANY),  # frame stays in HBM
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


# ---------------------------------------------------------------------------
# The SECOND, working formulation: Mosaic-aligned superset DMA + dynamic roll,
# double-buffered so step c+1's DMAs fly while step c's rolls execute.
# ---------------------------------------------------------------------------

SUP_LANES = 256  # 128-aligned superset lanes covering a 32-lane window


def _sublane_tile(dtype) -> int:
    """Mosaic's second-minor tiling: 8 sublanes for 32-bit, 16 for 16-bit.
    DMA slice starts must be multiples of this."""
    return 16 if jnp.dtype(dtype).itemsize == 2 else 8


def _sup_rows(dtype) -> int:
    """Superset rows: a 32-row window anywhere needs 32 + (tile - 1)
    rounded up to the tile (40 for f32, 48 for bf16)."""
    t = _sublane_tile(dtype)
    return 32 + t


def _aligned_patch_kernel(
    coords_ref, next_ref, img_ref, out_ref, scratch, sems,
    *, group, H, W, tile, sup_rows,
):
    """Per keypoint: DMA an ALIGNED (sup_rows, 256) superset of the 32x32
    patch from HBM (tile-sublane / 128-lane aligned starts satisfy
    Mosaic's DMA tiling rules — the constraint that killed the first
    kernel), then center it with `pltpu.roll` (dynamic circular shift;
    positive amounts only) and emit the 32x32 prefix.

    DOUBLE BUFFERING: `coords_ref` carries this step's keypoint block and
    `next_ref` the SAME array indexed one block ahead; step c waits on
    the copies it issued at step c-1 into buffer slot c%2 while step
    c+1's copies stream into slot (c+1)%2 — the rolls and the HBM
    traffic overlap instead of serializing (measured 1.6 -> ~1.0 ms for
    8x1000 f32 keypoints before the bf16 halving).

    The aligned starts are computed IN-KERNEL from the raw window
    origins: Mosaic proves divisibility of the `(y // 8) * 8` expression
    itself, but cannot prove it for a prefetched value that merely
    happens to be aligned (passing precomputed aligned starts re-trips
    "failed to prove ... divisible by the tiling")."""
    def aligned(ref, n):
        y0 = ref[0, n, 0]
        x0 = ref[0, n, 1]
        # Clamp BEFORE the align-down: Mosaic proves divisibility of
        # (expr // t) * t but not of min(t*a, t*b). H/W - superset are
        # themselves tile/128-divisible for supported shapes, so the
        # align-down of the clamped origin stays in-bounds.
        y0a = (jnp.minimum(y0, H - sup_rows) // tile) * tile
        x0a = (jnp.minimum(x0, W - SUP_LANES) // 128) * 128
        return y0a, x0a, y0 - y0a, x0 - x0a

    b = pl.program_id(0)
    c = pl.program_id(1)
    num_c = pl.num_programs(1)
    slot = jax.lax.rem(c, 2)

    def start(ref, s):
        for g in range(group):
            y0a, x0a, _, _ = aligned(ref, g)
            pltpu.make_async_copy(
                img_ref.at[b, pl.ds(y0a, sup_rows), pl.ds(x0a, SUP_LANES)],
                scratch.at[s, g],
                sems.at[s, g],
            ).start()

    @pl.when(c == 0)
    def _prologue():  # first block of each frame pays full DMA latency
        start(coords_ref, slot)

    @pl.when(c + 1 < num_c)
    def _prefetch():  # next block's copies overlap this block's rolls
        start(next_ref, 1 - slot)

    for g in range(group):
        y0a, x0a, sh_y, sh_x = aligned(coords_ref, g)
        pltpu.make_async_copy(
            img_ref.at[b, pl.ds(y0a, sup_rows), pl.ds(x0a, SUP_LANES)],
            scratch.at[slot, g],
            sems.at[slot, g],
        ).wait()
        # Mosaic's dynamic rotate is 32-bit only ("Rotate with non-32-bit
        # data" is not implemented): 16-bit patches upcast IN VMEM for
        # the two rolls and truncate back — exact for the u8 integer
        # grid, and the HBM traffic (the thing being halved) stays bf16.
        tile16 = jnp.dtype(out_ref.dtype).itemsize == 2
        block = scratch[slot, g]
        r = block.astype(jnp.float32) if tile16 else block
        r = pltpu.roll(r, sup_rows - sh_y, 0)
        r = pltpu.roll(r, SUP_LANES - sh_x, 1)
        r = r[:32, :32]
        out_ref[0, g] = r.astype(out_ref.dtype) if tile16 else r


@functools.partial(jax.jit, static_argnames=("group", "interpret"))
def gather_aligned_patches(
    img: jnp.ndarray,
    xy: jnp.ndarray,
    group: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """img (B, H, W) f32 or bf16, xy (B, N, 2) float pixel coords ->
    (B, N, 32, 32) patches with the keypoint at (15, 15) —
    the fused replacement for describe_matmul's slab row gather +
    masked-select lane alignment (measured 3.5 + ~3 ms of an 8-frame
    batch in XLA). Keypoints are clamped to [15, W-18] x [15, H-17]
    (identical to the XLA path for detector-margin keypoints).

    Pass a PRE-QUANTIZED bf16 frame (`orb._quantize_u8(img).astype
    (bfloat16)` — exact integers <= 255) to halve the DMA traffic:
    quantize-then-gather is bit-identical to gather-then-quantize
    because both are pointwise selections of the same values."""
    B, H, W = img.shape
    N = xy.shape[1]
    tile = _sublane_tile(img.dtype)
    sup_rows = _sup_rows(img.dtype)
    # Mosaic requires the coords SMEM block's sublane dim (= group) to be
    # a multiple of 8; pad the keypoint axis up and slice the output.
    n_pad = (-N) % group
    if n_pad:
        xy = jnp.concatenate(
            [xy, jnp.full((B, n_pad, 2), 16.0, xy.dtype)], axis=1
        )
    # Clamp against the ORIGINAL dims (parity with the XLA path), THEN pad
    # the frame so the aligned-superset DMA always fits. The in-kernel
    # align-down of `min(x0, W - SUP_LANES)` only bounds the shift to
    # sh_x <= 223 when W % 128 == 0 (otherwise right-edge keypoints get
    # sh_x up to 255 and `pltpu.roll` wraps the patch — silently corrupt
    # descriptors at the pyramid's 544/448-wide levels). Same for rows:
    # sh_y <= tile needs H % tile == 0. Padding costs one fused copy
    # (~10 us), and padded columns are never READ for in-bounds keypoints.
    cx = jnp.clip(jnp.round(xy[..., 0]).astype(jnp.int32), 15, W - 18)
    cy = jnp.clip(jnp.round(xy[..., 1]).astype(jnp.int32), 15, H - 17)
    coords = jnp.stack([cy - 15, cx - 15], axis=-1)  # (B, N(+pad), 2)
    Hp = max(sup_rows, H + ((-H) % tile))
    Wp = max(SUP_LANES, W + ((-W) % 128))
    if (Hp, Wp) != (H, W):
        img = jnp.pad(img, ((0, 0), (0, Hp - H), (0, Wp - W)))
        H, W = Hp, Wp

    # Coords ride BLOCKED SMEM operands — one (1, group, 2) tile per
    # grid step (scalar prefetch would stage the ENTIRE (B, N, 2) array
    # in SMEM and overflow at production N). The same array is passed
    # TWICE with the second index map one block ahead, giving the kernel
    # next step's coordinates for the double-buffered DMA prefetch.
    Np = N + n_pad
    num_c = Np // group
    out = pl.pallas_call(
        functools.partial(
            _aligned_patch_kernel,
            group=group, H=H, W=W, tile=tile, sup_rows=sup_rows,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Np, 32, 32), img.dtype),
        grid=(B, num_c),
        in_specs=[
            pl.BlockSpec(
                (1, group, 2), lambda b, c: (b, c, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, group, 2),
                lambda b, c: (b, jnp.minimum(c + 1, num_c - 1), 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, group, 32, 32), lambda b, c: (b, c, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, group, sup_rows, SUP_LANES), img.dtype),
            pltpu.SemaphoreType.DMA((2, group)),
        ],
        interpret=interpret,
    )(coords, coords, img)
    return out[:, :N]
