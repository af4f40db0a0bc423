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
import jax.numpy as jnp

from ..ops.sampling import bilinear_sample
from . import backbone as backbone_mod
from .backbone import ViTBackbone, patch_to_pixel
from .refiner import DescriptorRefiner
from .selector import KeypointSelector, refine_keypoints, select_keypoints
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
    # Soft-argmax sub-patch keypoint positions (selector.refine_keypoints).
    # Off by default: a model trained WITHOUT it has no gradient pressure
    # to make saliency centroids localize, and enabling it post-hoc
    # measurably hurts (repeatability@1 0.96 -> 0.71 on the tiny synthetic
    # checkpoint). Train with it on (`model.subpatch_refine: true`) to let
    # the loss shape saliency into a localizer.
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

    def features_and_saliency(self, images, train: bool = False):
        """Backbone grid + saliency map (the trainable-path prefix)."""
        feats = self.backbone(images, train=train)
        # NaN guard mirroring `train.py:309-312`.
        saliency = self.selector(feats)
        saliency = jnp.where(
            jnp.isfinite(saliency), saliency, jnp.full_like(saliency, 0.5)
        )
        return feats, saliency

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
        xy = (
            refine_keypoints(saliency, kp.xy)
            if self.subpatch_refine
            else kp.xy
        )
        _, desc, conf = self.describe_at(feats, xy)
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
