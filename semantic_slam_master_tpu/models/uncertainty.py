"""Per-keypoint uncertainty / confidence head.

First-class port of the reference's declared-but-never-wired estimator
(`models/uncertainty_estimator.py:12-183`; SURVEY.md §2 flags it as the
north star's BA residual-weighting hook). MLP over concat(backbone
feature, descriptor) -> sigmoid confidence; calibration + expected-error
losses; confidence filtering re-designed as a mask (fixed shapes)
instead of the reference's per-image gather/re-pad loops (`:144-183`).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp


class UncertaintyEstimator(nn.Module):
    hidden_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, backbone_features: jnp.ndarray, descriptors: jnp.ndarray
    ) -> jnp.ndarray:
        """(..., C_feat), (..., C_desc) -> confidence (..., 1) in [0, 1]."""
        x = jnp.concatenate([backbone_features, descriptors], axis=-1)
        x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(
            nn.Dense(self.hidden_dim // 2, dtype=self.dtype, name="fc2")(x)
        )
        return nn.sigmoid(nn.Dense(1, dtype=self.dtype, name="fc3")(x))


def calibration_loss(
    confidence: jnp.ndarray,
    actual_error: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    epsilon: float = 1e-6,
) -> jnp.ndarray:
    """MSE between confidence and 1 - normalized error
    (`uncertainty_estimator.py:69-97`), mask-aware."""
    err_norm = actual_error / (jnp.max(actual_error) + epsilon)
    target = 1.0 - err_norm
    se = (confidence[..., 0] - target) ** 2
    if valid is None:
        return jnp.mean(se)
    m = valid.astype(se.dtype)
    return jnp.sum(se * m) / jnp.maximum(jnp.sum(m), 1.0)


def expected_error_loss(
    confidence: jnp.ndarray,
    actual_error: jnp.ndarray,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """L1 between implied error 1/conf - 1 and the measured error
    (`uncertainty_estimator.py:99-121`)."""
    pred_err = 1.0 / (confidence[..., 0] + 1e-6) - 1.0
    ae = jnp.abs(pred_err - actual_error)
    if valid is None:
        return jnp.mean(ae)
    m = valid.astype(ae.dtype)
    return jnp.sum(ae * m) / jnp.maximum(jnp.sum(m), 1.0)


def confidence_mask(
    confidence: jnp.ndarray, threshold: float = 0.5
) -> jnp.ndarray:
    """Keypoint filter as a validity mask; always keeps at least the
    single most-confident keypoint per image (the reference's keep-one
    guard, `uncertainty_estimator.py:153-155`).

    confidence: (B, N, 1) -> (B, N) bool.
    """
    conf = confidence[..., 0]
    mask = conf >= threshold
    best = jnp.argmax(conf, axis=-1)
    keep_best = jax_one_hot_bool(best, conf.shape[-1])
    return mask | keep_best


def jax_one_hot_bool(idx: jnp.ndarray, n: int) -> jnp.ndarray:
    return jnp.arange(n)[None, :] == idx[..., None]
