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


def test_aligned_patch_kernel_non_128_width(rng):
    """Regression (round-2 advisor, high): at W % 128 != 0 (the pyramid's
    544- and 448-wide levels) right-edge keypoints used to get a lane
    shift > 224, wrapping the 32-lane patch around the 256-lane superset
    via `pltpu.roll` — silently corrupted descriptors. The fix pads the
    frame to a 128-multiple before the kernel; patches must match the
    direct slice everywhere, including the extreme right edge."""
    for H, W in [(408, 544), (336, 448), (100, 300)]:
        B, N = 1, 16
        img = jnp.asarray(rng.normal(size=(B, H, W)).astype(np.float32))
        # Dense coverage of the right-edge danger zone plus interior refs.
        xs = np.concatenate(
            [np.linspace(W - 60, W + 5, 12), [20.0, 130.0, 260.0, 380.0]]
        )
        ys = np.linspace(16, H - 5, N)
        xy = jnp.asarray(np.stack([xs, ys], axis=-1)[None].astype(np.float32))
        out = np.asarray(
            ppatches.gather_aligned_patches(img, xy, interpret=True)
        )
        im = np.asarray(img)
        for n in range(N):
            cx = int(np.clip(round(float(xy[0, n, 0])), 15, W - 18))
            cy = int(np.clip(round(float(xy[0, n, 1])), 15, H - 17))
            ref = im[0, cy - 15 : cy + 17, cx - 15 : cx + 17]
            assert np.array_equal(out[0, n], ref), (H, W, n)


def test_aligned_patch_kernel_bf16_prequantized(rng):
    """The production TPU path DMAs the pre-quantized bf16 frame (16-
    sublane tiling -> 48-row supersets). Patches must equal the direct
    slice of the quantized frame bit-exactly — including edges — which
    also proves quantize-then-gather == gather-then-quantize."""
    for H, W in [(48, 256), (59, 300), (408, 544)]:
        B, N = 1, 16
        img = jnp.asarray(rng.uniform(0, 1, size=(B, H, W)).astype(np.float32))
        imgq = jnp.round(jnp.clip(img, 0.0, 1.0) * 255.0).astype(jnp.bfloat16)
        xs = np.concatenate(
            [np.linspace(W - 40, W + 5, 8), np.linspace(10, W - 60, 8)]
        )
        ys = np.concatenate(
            [np.linspace(H - 30, H + 2, 8), np.linspace(10, H - 40, 8)]
        )
        xy = jnp.asarray(np.stack([xs, ys], axis=-1)[None].astype(np.float32))
        out = np.asarray(
            ppatches.gather_aligned_patches(imgq, xy, interpret=True)
        )
        im = np.asarray(imgq)
        for n in range(N):
            cx = int(np.clip(round(float(xy[0, n, 0])), 15, W - 18))
            cy = int(np.clip(round(float(xy[0, n, 1])), 15, H - 17))
            ref = im[0, cy - 15 : cy + 17, cx - 15 : cx + 17]
            assert np.array_equal(out[0, n], ref), (H, W, n)


def test_aligned_patch_kernel_non_8_height(rng):
    """H % 8 != 0: bottom-edge keypoints need the row padding too
    (sh_y <= 8 only holds when H is a multiple of 8)."""
    B, H, W, N = 1, 59, 256, 8
    img = jnp.asarray(rng.normal(size=(B, H, W)).astype(np.float32))
    ys = np.linspace(H - 25, H + 2, N)
    xy = jnp.asarray(
        np.stack([np.linspace(20, 230, N), ys], axis=-1)[None].astype(np.float32)
    )
    out = np.asarray(ppatches.gather_aligned_patches(img, xy, interpret=True))
    im = np.asarray(img)
    for n in range(N):
        cx = int(np.clip(round(float(xy[0, n, 0])), 15, W - 18))
        cy = int(np.clip(round(float(xy[0, n, 1])), 15, H - 17))
        ref = im[0, cy - 15 : cy + 17, cx - 15 : cx + 17]
        assert np.array_equal(out[0, n], ref), n


def test_fast_score_kernel_matches_xla(rng):
    """Single-pass Pallas FAST-9 response == XLA stencil away from the
    3-px wrap ring (interpret mode; real-TPU dispatch shares this code).
    Values agree to f32-sum-order tolerance and the NMS survivor set is
    identical inside the detector margin."""
    from semantic_slam_master_tpu.data import synthetic
    from semantic_slam_master_tpu.ops import fast, image
    from semantic_slam_master_tpu.ops.pallas import fast_score as pfs

    assert np.array_equal(pfs._CIRCLE, fast.FAST_CIRCLE)

    seq = synthetic.make_sequence(num_frames=2, scale=0.5)
    gray = jnp.stack(
        [image.rgb_to_gray(jnp.asarray(seq.frame(i)["rgb"])) for i in range(2)]
    )
    ref = np.asarray(fast.fast_score_xla(gray, 0.05))
    got = np.asarray(pfs.fast_score_pallas(gray, 0.05, interpret=True))
    assert got.shape == ref.shape
    inner = (slice(None), slice(4, -4), slice(4, -4))
    # Segment-test decisions are exact; scores match to sum-order noise.
    assert np.array_equal(ref[inner] > 0, got[inner] > 0)
    np.testing.assert_allclose(got[inner], ref[inner], atol=1e-5, rtol=1e-5)

    # W=352 (not a lane multiple) exercises the pad path.
    g2 = gray[:, :, :352]
    ref2 = np.asarray(fast.fast_score_xla(g2, 0.05))
    got2 = np.asarray(pfs.fast_score_pallas(g2, 0.05, interpret=True))
    np.testing.assert_allclose(
        got2[:, 4:-4, 4:-4], ref2[:, 4:-4, 4:-4], atol=1e-5, rtol=1e-5
    )
