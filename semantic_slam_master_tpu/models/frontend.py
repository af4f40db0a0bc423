"""The learned feature frontend: backbone -> saliency -> keypoints ->
descriptors -> confidence, as one jitted pipeline.

This is the framework's version of the 5-stage `extract_features` pass
shared by every reference test/visualizer (SURVEY.md §3.2;
`test_tracking.py:68-85`): one pure function over a batch of frames, no
host round-trips, returning pixel-space keypoints + L2 descriptors +
confidence ready for matching / PnP / BA.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.sampling import bilinear_sample
from . import backbone as backbone_mod
from .backbone import ViTBackbone, patch_to_pixel
from .refiner import DescriptorRefiner
from .selector import KeypointSelector, select_keypoints
from .uncertainty import UncertaintyEstimator


class FrontendOutput(NamedTuple):
    keypoints_px: jnp.ndarray  # (B, K, 2) pixel coords
    keypoints_patch: jnp.ndarray  # (B, K, 2) patch coords
    descriptors: jnp.ndarray  # (B, K, D) L2-normalized
    scores: jnp.ndarray  # (B, K) saliency at keypoints
    confidence: jnp.ndarray  # (B, K) uncertainty-head confidence
    valid: jnp.ndarray  # (B, K)
    saliency: jnp.ndarray  # (B, H, W, 1) full map
    features: jnp.ndarray  # (B, H, W, C) backbone grid


class OffsetHead(nn.Module):
    """Soft-argmax sub-patch keypoint localization (TPU-build extension).

    Scores every pixel of the keypoint's intensity window with a small
    conv stack (modulated by the ViT token + 3x3 saliency context) and
    returns the softmax-expected position relative to the window center,
    in window pixels. Shift-EQUIVARIANT by construction: translating the
    window content translates the score map and hence the expectation
    one-for-one, so training only has to learn WHAT structure to lock
    onto, not equivariance itself. Two direct-regression designs are
    recorded negative results: an MLP on the ViT token + saliency
    context trained to a CONSTANT offset (sub-patch position is a phase
    the token may discard), and an MLP on the flattened raw intensities
    stayed near-constant too (offset std 0.19 px, matched residual ==
    GT flow) — a Dense head must learn shift-equivariance from data,
    which this recipe's ~2k steps don't provide.

    Supervised by the warp-consistency localization loss ONLY
    (descriptors sample the refined positions under stop-gradient), so
    — unlike a saliency
    soft-argmax, whose offsets the descriptor loss can silently kill by
    saturating the saliency map (measured: mean saliency 0.42 -> 0.90,
    repeatability 0.96 -> 0.13) — there is no competing gradient
    pressure. Zero-init final conv: uniform scores -> the expectation
    sits exactly at the window center -> training starts at the
    reference's patch-center behaviour.
    """

    hidden_dim: int = 16
    temperature: float = 0.5
    # Local soft-argmax half-width: the expectation is restricted to a
    # (2*local_radius+1)^2 box around the (stop-gradient) score argmax.
    # A GLOBAL expectation averages the peaks of a multimodal score map
    # (windows routinely contain several corners), which caps
    # localization precision at ~the peak spacing — measured 3.5-4 px
    # mean residual plateau; the local form keeps sub-pixel gradients
    # while committing to one peak.
    local_radius: int = 4

    @nn.compact
    def __call__(
        self,
        pixel_patch: jnp.ndarray,
        local_feats: jnp.ndarray,
        sal_patch: jnp.ndarray,
    ):
        """pixel_patch: (B, K, P, P) per-window-standardized intensities.
        Returns (B, K, 2) expected (dx, dy) in window pixels, intrinsically
        bounded to +/-(P-1)/2."""
        B, K, P, _ = pixel_patch.shape
        x = pixel_patch.reshape(B * K, P, P, 1)
        ctx = jnp.concatenate(
            [
                local_feats.astype(jnp.float32),
                sal_patch.astype(jnp.float32),
            ],
            axis=-1,
        )
        ctx = nn.Dense(self.hidden_dim)(ctx).reshape(B * K, 1, 1, self.hidden_dim)
        x = nn.gelu(nn.Conv(self.hidden_dim, (3, 3))(x) + ctx)
        x = nn.gelu(nn.Conv(self.hidden_dim, (3, 3))(x))
        score = nn.Conv(1, (3, 3), kernel_init=nn.initializers.zeros)(x)
        flat = score.reshape(B * K, P * P) / self.temperature
        # Commit to the strongest peak (hard, grad-free), localize within
        # its box (soft, differentiable). The argmax tie-break prior pulls
        # toward the window center so the zero-init (all-zero score) map
        # peaks at the center and the expectation starts EXACTLY there —
        # the reference's patch-center behaviour, not a corner artifact.
        c = (P - 1) / 2.0
        d2 = (jnp.arange(P) - c) ** 2
        prior = -1e-6 * (d2[:, None] + d2[None, :]).reshape(P * P)
        peak = jax.lax.stop_gradient(jnp.argmax(flat + prior, axis=-1))
        py = (peak // P)[:, None]
        px = (peak % P)[:, None]
        iy = jnp.arange(P)[None, :]
        near_y = jnp.abs(iy - py) <= self.local_radius  # (BK, P)
        near_x = jnp.abs(iy - px) <= self.local_radius
        mask = (near_y[:, :, None] & near_x[:, None, :]).reshape(B * K, P * P)
        flat = jnp.where(mask, flat, -jnp.inf)
        w = nn.softmax(flat, axis=-1).reshape(B, K, P, P)
        pos = jnp.arange(P, dtype=w.dtype) - (P - 1) / 2.0
        dx = jnp.einsum("bkyx,x->bk", w, pos)
        dy = jnp.einsum("bkyx,y->bk", w, pos)
        return jnp.stack([dx, dy], axis=-1)


class LearnedFrontend(nn.Module):
    """End-to-end learned frontend (reference model family, SURVEY.md §2.1
    rows: DinoBackbone / KeypointSelector / DescriptorRefiner /
    UncertaintyEstimator) with the reference's default dimensions
    (`configs/train_config.yaml:5-17`)."""

    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    patch_size: int = 16
    pos_grid: int = 28
    selector_hidden: int = 256
    refiner_hidden: int = 384
    refiner_layers: int = 4
    descriptor_dim: int = 128
    estimator_hidden: int = 128
    num_keypoints: int = 500
    nms_radius: int = 2
    # Learned sub-patch keypoint positions (OffsetHead + refine_at),
    # supervised by losses.localization_loss. Off by default: a model
    # trained without it has no offset-head parameters. (An earlier
    # saliency soft-argmax design — selector.refine_keypoints — is kept
    # as a parameter-free alternative, but training it end-to-end
    # collapses: the descriptor loss saturates the saliency map to zero
    # the offsets out; see OffsetHead's docstring.)
    subpatch_refine: bool = False
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.backbone = ViTBackbone(
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            patch_size=self.patch_size,
            pos_grid=self.pos_grid,
            dtype=self.dtype,
        )
        self.selector = KeypointSelector(hidden_dim=self.selector_hidden)
        self.refiner = DescriptorRefiner(
            hidden_dim=self.refiner_hidden,
            output_dim=self.descriptor_dim,
            num_layers=self.refiner_layers,
        )
        self.estimator = UncertaintyEstimator(hidden_dim=self.estimator_hidden)
        # Conv channels are intentionally small: the head scores local
        # intensity structure (corner-ness), not semantics.
        self.offset_head = OffsetHead(hidden_dim=16)

    def features_and_saliency(self, images, train: bool = False):
        """Backbone grid + saliency map (the trainable-path prefix)."""
        feats = self.backbone(images, train=train)
        # NaN guard mirroring `train.py:309-312`.
        saliency = self.selector(feats)
        saliency = jnp.where(
            jnp.isfinite(saliency), saliency, jnp.full_like(saliency, 0.5)
        )
        return feats, saliency

    def refine_at(self, feats, saliency, images, keypoints_patch):
        """Learned sub-patch positions: patch-center coords + OffsetHead
        offsets from the raw intensity patch + local feature + 3x3
        saliency context. ``images``: the model input (B, H, W, 3)."""
        from ..ops.sampling import gather_patches, nearest_sample

        sal = saliency[..., 0] if saliency.ndim == 4 else saliency
        neigh = jnp.stack(
            [
                nearest_sample(
                    sal, keypoints_patch + jnp.asarray([dx, dy], keypoints_patch.dtype)
                )
                for dy in (-1.0, 0.0, 1.0)
                for dx in (-1.0, 0.0, 1.0)
            ],
            axis=-1,
        )  # (B, K, 9)
        local = bilinear_sample(feats, keypoints_patch)
        gray = jnp.mean(images.astype(jnp.float32), axis=-1)  # (B, H, W)
        centers_px = patch_to_pixel(keypoints_patch, self.patch_size)
        # Window radius > patch_size/2: structure at the far sub-patch
        # phases (+/- 8 px) must sit INTERIOR to the window, not on its
        # edge, for the conv stack to score it.
        r = self.patch_size // 2 + 2
        patches = gather_patches(gray, centers_px, radius=r)  # (B, K, P, P)
        # Per-window standardization: offsets must key on STRUCTURE phase,
        # not absolute brightness/contrast.
        mu = jnp.mean(patches, axis=(-1, -2), keepdims=True)
        sd = jnp.std(patches, axis=(-1, -2), keepdims=True)
        patches = (patches - mu) / (sd + 1e-5)
        off_px = self.offset_head(patches, local, neigh)  # window pixels
        return keypoints_patch + off_px / self.patch_size

    def describe_at(self, feats, keypoints_patch):
        """Bilinear feature sampling + descriptor refinement at given
        patch-space keypoints (differentiable w.r.t. feats)."""
        sampled = bilinear_sample(feats, keypoints_patch)
        desc = self.refiner(sampled)
        conf = self.estimator(sampled, desc)[..., 0]
        return sampled, desc, conf

    def __call__(self, images, train: bool = False) -> FrontendOutput:
        """images: (B, H, W, 3) normalized RGB -> FrontendOutput."""
        feats, saliency = self.features_and_saliency(images, train=train)
        kp = select_keypoints(
            saliency, num_keypoints=self.num_keypoints, nms_radius=self.nms_radius
        )
        # Geometric coords get learned sub-patch offsets; descriptors
        # sample the refined position under STOP-GRADIENT — they describe
        # the content point the keypoint locks onto (so a matched pair
        # samples the same physical structure), while the descriptor loss
        # exerts no pressure on the offsets (see OffsetHead; sampling
        # patch centers instead leaves matched pairs locked onto
        # DIFFERENT structures within their cells — measured inlier
        # ratio 0.19 with repeatability 0.68).
        xy = (
            self.refine_at(feats, saliency, images, kp.xy)
            if self.subpatch_refine
            else kp.xy
        )
        _, desc, conf = self.describe_at(feats, jax.lax.stop_gradient(xy))
        return FrontendOutput(
            keypoints_px=patch_to_pixel(xy, self.patch_size),
            keypoints_patch=xy,
            descriptors=desc,
            scores=kp.score,
            confidence=conf,
            valid=kp.valid,
            saliency=saliency,
            features=feats,
        )


def tiny_frontend(**overrides) -> LearnedFrontend:
    """A small config for tests/CI (2-block ViT, 64-d)."""
    cfg = dict(
        embed_dim=64,
        depth=2,
        num_heads=2,
        selector_hidden=32,
        refiner_hidden=64,
        refiner_layers=3,
        descriptor_dim=32,
        estimator_hidden=32,
        num_keypoints=64,
        pos_grid=8,
    )
    cfg.update(overrides)
    return LearnedFrontend(**cfg)
