"""Keypoint saliency head + fixed-K keypoint selection.

The saliency CNN mirrors the reference's 2-layer head exactly
(`models/keypoint_selector.py:30-34`: Conv3x3 -> ReLU -> Conv1x1 ->
sigmoid, Xavier(gain=0.5) init).

`select_keypoints` re-designs the reference's host-side fallback cascade
(`keypoint_selector.py:69-207`: adaptive percentile threshold, NMS,
top-k, three progressively-lower-threshold retries, pad-with-best) as a
single fixed-shape ranked top-k: every patch gets a *tier* from the
percentile ladder [0.50, 0.40, 0.30, 0.20, 0.10] (tier 0 = passes the
primary threshold after NMS, tier 5 = raw-saliency fallback) and is
ranked by ``-tier`` then score. One `top_k` then reproduces the
cascade's selection order without data-dependent shapes (SURVEY.md
§7.3).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.fixed import masked_topk, quantile
from ..ops.image import max_pool_same

PERCENTILE_LADDER = (0.50, 0.40, 0.30, 0.20, 0.10)
MIN_THRESHOLDS = (0.1, 0.05, 0.05, 0.05, 0.05)  # reference's floors (:109,141)


class KeypointSelector(nn.Module):
    """Per-patch saliency scores in [0, 1].

    The 3x3 conv is spelled as 9 shifted (HW, C_in) x (C_in, C_out)
    matmuls instead of `lax.conv`: on TPU a conv with tiny spatial dims
    (28x28) and wide channels lowers catastrophically (~60 GFLOP/s
    measured — 170 ms for an 11 GFLOP op), while the shifted-matmul form
    rides the MXU. Parameters keep the standard (3, 3, C_in, C_out) conv
    kernel layout so checkpoints stay conv-compatible.
    """

    hidden_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        """features: (B, H, W, C) patch grid -> saliency (B, H, W, 1)."""
        B, H, W, C = features.shape
        kernel = self.param(
            "conv1_kernel",
            nn.initializers.xavier_uniform(),
            (3, 3, C, self.hidden_dim),
        )
        bias = self.param("conv1_bias", nn.initializers.zeros, (self.hidden_dim,))
        padded = jnp.pad(features, ((0, 0), (1, 1), (1, 1), (0, 0)))
        x = bias.astype(self.dtype) * jnp.ones(
            (B, H, W, self.hidden_dim), self.dtype
        )
        for dy in range(3):
            for dx in range(3):
                window = jax.lax.dynamic_slice(
                    padded, (0, dy, dx, 0), (B, H, W, C)
                )
                x = x + jnp.einsum(
                    "bhwc,cd->bhwd",
                    window.astype(self.dtype),
                    kernel[dy, dx].astype(self.dtype),
                    preferred_element_type=self.dtype,
                )
        x = nn.relu(x)
        x = nn.Dense(
            1,
            dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="conv2",
        )(x)
        return nn.sigmoid(x)


class SelectedKeypoints(NamedTuple):
    xy: jnp.ndarray  # (B, K, 2) patch coords (x, y) — reference convention
    score: jnp.ndarray  # (B, K)
    valid: jnp.ndarray  # (B, K) — only False for all-NaN degenerate inputs


def select_keypoints(
    saliency: jnp.ndarray,
    num_keypoints: int = 500,
    nms_radius: int = 2,
) -> SelectedKeypoints:
    """Fixed-K keypoint selection in PATCH coordinates.

    saliency: (B, H, W, 1) or (B, H, W). Selection order matches the
    reference cascade: NMS survivors above the adaptive 50th-percentile
    threshold first (by score), then NMS survivors above each lower
    percentile, finally raw saliency; always exactly K outputs.
    """
    if saliency.ndim == 4:
        saliency = saliency[..., 0]
    B, H, W = saliency.shape
    flat = saliency.reshape(B, H * W)

    nms = max_pool_same(saliency, nms_radius)
    is_peak = saliency >= nms
    nms_sal = jnp.where(is_peak, saliency, 0.0).reshape(B, H * W)

    # Tier of each patch: lowest ladder index whose threshold it clears
    # (after NMS); ladder misses fall to the raw-saliency tier.
    num_tiers = len(PERCENTILE_LADDER)
    tier = jnp.full((B, H * W), num_tiers, dtype=jnp.float32)
    for i in reversed(range(num_tiers)):
        thr = jnp.maximum(
            quantile(flat, PERCENTILE_LADDER[i], axis=-1), MIN_THRESHOLDS[i]
        )
        tier = jnp.where(nms_sal > thr[:, None], float(i), tier)

    # Rank key: primary = tier (lower better), secondary = score within
    # tier. Tiered patches rank by NMS score, the raw tier by raw score
    # (the reference's last-resort top-k, :174-184).
    score_for_rank = jnp.where(tier < num_tiers, nms_sal, flat)
    rank = -tier * 10.0 + jnp.clip(score_for_rank, 0.0, 1.0)

    values, indices, valid = masked_topk(
        rank, jnp.ones_like(rank, dtype=bool), num_keypoints
    )
    ys = (indices // W).astype(jnp.float32)
    xs = (indices % W).astype(jnp.float32)
    scores = jnp.take_along_axis(flat, indices, axis=-1)
    return SelectedKeypoints(
        xy=jnp.stack([xs, ys], axis=-1), score=scores, valid=valid
    )


def refine_keypoints(
    saliency: jnp.ndarray,
    xy: jnp.ndarray,
    temperature: float = 0.05,
) -> jnp.ndarray:
    """Sub-patch keypoint refinement: soft-argmax of the 3x3 saliency
    neighborhood around each selected patch.

    The reference pins keypoints to patch centers (`patch_to_pixel`,
    `dino_backbone.py:154-165`), which caps repeatability at the 16 px
    patch pitch: any inter-frame motion beyond ~3 px moves the true
    corner away from the center the selector re-picks. The saliency map
    knows better — a corner between two patches elevates both — so the
    local softmax centroid recovers a continuous position. Offsets stay
    within (-1, 1) patches; descriptors are already bilinearly sampled
    (`LearnedFrontend.describe_at`) so fractional coords need no other
    change. Differentiable; safe to enable at inference on checkpoints
    trained without it.

    saliency: (B, H, W[, 1]); xy: (B, K, 2) patch coords -> refined
    (B, K, 2) float patch coords.
    """
    from ..ops.sampling import nearest_sample

    if saliency.ndim == 4:
        saliency = saliency[..., 0]
    B, H, W = saliency.shape
    neigh = []
    offs = []
    for dy in (-1.0, 0.0, 1.0):
        for dx in (-1.0, 0.0, 1.0):
            d = jnp.asarray([dx, dy], xy.dtype)
            neigh.append(nearest_sample(saliency, xy + d))  # (B, K)
            offs.append(d)
    s = jnp.stack(neigh, axis=-1)  # (B, K, 9)
    o = jnp.stack(offs, axis=0)  # (9, 2)
    w = jax.nn.softmax(s / temperature, axis=-1)
    offset = jnp.einsum("bkn,nd->bkd", w, o)
    # Border patches see clamped (duplicated) neighbors; keep the result
    # inside the grid.
    refined = xy + offset
    lim = jnp.asarray([W - 1.0, H - 1.0], xy.dtype)
    return jnp.clip(refined, 0.0, lim)
