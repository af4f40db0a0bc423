"""Per-frame semantic segmentation CNN + semantic residual weighting.

Capability config 2 of BASELINE.json ("per-frame semantic segmentation
CNN inference on TUM RGB-D frames") and the source of the semantic class
weights that scale BA reprojection residuals (the "semantic" in
semantic SLAM; north-star: "semantic labels weighting the reprojection
residuals").

Architecture: a small encoder/decoder fully-convolutional net — three
stride-2 stages, dilated bottleneck, skip connection, logits at 1/4
resolution upsampled bilinearly. Channels-last NHWC, bf16 matmul path:
every conv lowers to an MXU matmul at these widths. Intentionally
compact (frames are 480p and the network runs per frame inside the SLAM
loop); swap-in of larger flax segmentation models is a config change.

Class convention (aligned with the synthetic world + TUM indoor scenes):
0 floor, 1 wall, 2 ceiling, 3 furniture, 4 person/dynamic, 5 other.
Dynamic classes get near-zero BA weight — the mechanism that makes
fr3_walking_* sequences tractable where the reference's ORB-SLAM3
baseline degrades (ATE 0.46 m on walking_xyz, BASELINE.md A).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

NUM_CLASSES = 6
CLASS_NAMES = ("floor", "wall", "ceiling", "furniture", "person", "other")
# BA residual weight per class: static scene geometry is trusted,
# dynamic classes are almost excluded.
DEFAULT_CLASS_WEIGHTS = (1.0, 1.0, 1.0, 1.0, 0.05, 0.7)


class ConvBlock(nn.Module):
    features: int
    strides: int = 1
    dilation: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            kernel_size=(3, 3),
            strides=(self.strides, self.strides),
            kernel_dilation=(self.dilation, self.dilation),
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.GroupNorm(num_groups=8, dtype=jnp.float32)(x)
        return nn.relu(x)


class SemanticSegmenter(nn.Module):
    num_classes: int = NUM_CLASSES
    width: int = 32
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self, rgb: jnp.ndarray, train: bool = False, full_res: bool = True
    ) -> jnp.ndarray:
        """rgb: (B, H, W, 3) in [0, 1] -> logits (B, H, W, num_classes).

        ``full_res=False`` returns the decoder's native 1/4-resolution
        logits (B, H/4, W/4, C) — the PRODUCTION inference path: the
        final bilinear upsample is param-free and exists only for dense
        full-res training losses/visualization, while SLAM consumes a
        handful of per-keypoint samples. Skipping it (and the full-res
        argmax/weight-map it forces downstream) removes the segmenter's
        single most HBM-expensive stage; checkpoints are identical in
        both modes.
        """
        B, H, W, _ = rgb.shape
        w = self.width
        x1 = ConvBlock(w, strides=2, dtype=self.dtype)(rgb, train)  # /2
        x2 = ConvBlock(2 * w, strides=2, dtype=self.dtype)(x1, train)  # /4
        x3 = ConvBlock(4 * w, strides=2, dtype=self.dtype)(x2, train)  # /8
        x3 = ConvBlock(4 * w, dilation=2, dtype=self.dtype)(x3, train)
        x3 = ConvBlock(4 * w, dilation=4, dtype=self.dtype)(x3, train)
        # Decoder: /8 -> /4 with skip
        x3u = _resize(x3, x2.shape[1], x2.shape[2])
        y = jnp.concatenate([x3u, x2], axis=-1)
        y = ConvBlock(2 * w, dtype=self.dtype)(y, train)
        logits4 = nn.Conv(
            self.num_classes, kernel_size=(1, 1), dtype=jnp.float32,
            name="classifier",
        )(y)
        if not full_res:
            return logits4
        return _resize(logits4, H, W)


def _resize(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    import jax

    return jax.image.resize(
        x, (x.shape[0], h, w, x.shape[-1]), method="bilinear"
    )


def predict_classes(logits: jnp.ndarray) -> jnp.ndarray:
    return jnp.argmax(logits, axis=-1)


def class_weights_map(
    labels: jnp.ndarray,
    class_weights: Sequence[float] = DEFAULT_CLASS_WEIGHTS,
) -> jnp.ndarray:
    """Per-pixel BA residual weight from a label map (int (B, H, W))."""
    table = jnp.asarray(class_weights, dtype=jnp.float32)
    return table[labels]


def keypoint_semantic_weights(
    logits_or_labels: jnp.ndarray,
    xy: jnp.ndarray,
    class_weights: Sequence[float] = DEFAULT_CLASS_WEIGHTS,
    image_size: tuple | None = None,
) -> jnp.ndarray:
    """Sample per-keypoint semantic weights at pixel coords (B, N, 2).

    Accepts either logits (B, Hm, Wm, C) or an int label map (B, Hm, Wm).
    ``xy`` is in FULL-RES pixel coordinates; pass ``image_size=(H, W)``
    when the map is lower resolution than the frame (the production
    ``full_res=False`` segmenter path) and coordinates are rescaled,
    pixel-center aligned, onto the map's grid.
    This is the glue between the segmenter and `slam.ba` confidence.
    """
    from ..ops.sampling import nearest_sample

    if logits_or_labels.ndim == 4:
        labels = predict_classes(logits_or_labels)
    else:
        labels = logits_or_labels
    if image_size is not None:
        H, W = image_size
        Hm, Wm = labels.shape[1], labels.shape[2]
        if (Hm, Wm) != (H, W):
            scale = jnp.asarray([Wm / W, Hm / H], xy.dtype)
            xy = (xy + 0.5) * scale - 0.5
    wmap = class_weights_map(labels, class_weights)
    return nearest_sample(wmap, xy)


def segmentation_loss(
    logits: jnp.ndarray, labels: jnp.ndarray, valid: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Pixel cross-entropy for training on the synthetic world's labels."""
    logp = nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if valid is None:
        return jnp.mean(nll)
    m = valid.astype(nll.dtype)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)
