"""Fixed-shape, mask-correct utilities.

XLA traces every jitted function once with static shapes, so the dynamic
control flow the reference leans on — percentile-threshold keypoint
cascades (`semantic-slam/models/keypoint_selector.py:100-199`), variable
match counts with padding (`semantic-slam/train.py:437-449`),
confidence filtering with re-padding
(`semantic-slam/models/uncertainty_estimator.py:160-183`) — is re-designed
here as fixed-K selection + validity masks (SURVEY.md §7.3 "Data-dependent
shapes under XLA").
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def masked_topk(
    scores: jnp.ndarray, mask: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Top-k of ``scores`` restricted to ``mask``; always returns exactly k.

    Returns ``(values, indices, valid)`` where ``valid[i]`` is False for
    slots that had fewer than k masked candidates (those slots repeat the
    best candidate, mirroring the reference's pad-with-best-duplicate
    fallback, `keypoint_selector.py:190-199`).
    """
    masked = jnp.where(mask, scores, NEG_INF)
    n = masked.shape[-1]
    if k > n:
        # Fewer candidates than requested: pad the candidate axis with
        # NEG_INF slots so the fixed-K contract still holds.
        masked = jnp.concatenate(
            [masked, jnp.full(masked.shape[:-1] + (k - n,), NEG_INF, masked.dtype)],
            axis=-1,
        )
    values, indices = jax.lax.top_k(masked, k)
    indices = jnp.minimum(indices, n - 1)
    valid = values > NEG_INF / 2
    # Replace invalid slots with the best entry so downstream gathers stay
    # in-bounds and deterministic.
    best_idx = indices[..., :1]
    best_val = values[..., :1]
    indices = jnp.where(valid, indices, best_idx)
    values = jnp.where(valid, values, best_val)
    return values, indices, valid


def quantile(x: jnp.ndarray, q: float, axis: int = -1) -> jnp.ndarray:
    """Linear-interpolation quantile, matching ``torch.quantile`` semantics
    used by the reference's adaptive keypoint threshold
    (`keypoint_selector.py:106`)."""
    return jnp.quantile(x, q, axis=axis, method="linear")


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis=None, eps: float = 1e-8):
    m = mask.astype(x.dtype)
    return jnp.sum(x * m, axis=axis) / jnp.maximum(jnp.sum(m, axis=axis), eps)


def masked_var(x: jnp.ndarray, mask: jnp.ndarray, axis=None, eps: float = 1e-8):
    mean = masked_mean(x, mask, axis=axis)
    if axis is not None:
        mean = jnp.expand_dims(mean, axis)
    return masked_mean((x - mean) ** 2, mask, axis=axis, eps=eps)


def pad_axis_to(x: jnp.ndarray, size: int, axis: int = 0, value=0):
    """Pad ``x`` along ``axis`` up to ``size`` with ``value`` (static shapes)."""
    cur = x.shape[axis]
    if cur == size:
        return x
    if cur > size:
        raise ValueError(f"axis {axis} already larger ({cur}) than target {size}")
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, size - cur)
    return jnp.pad(x, widths, constant_values=value)


def finite_or(x: jnp.ndarray, fallback) -> jnp.ndarray:
    """Replace non-finite entries with ``fallback`` — the jnp.where form of
    the reference's per-loss NaN fallbacks (`train.py:356-369`)."""
    return jnp.where(jnp.isfinite(x), x, jnp.asarray(fallback, dtype=x.dtype))


def round_up(x: int, multiple: int) -> int:
    """Round up to a hardware-friendly multiple (lane width 128 etc.)."""
    return ((x + multiple - 1) // multiple) * multiple


def inv3x3(V: jnp.ndarray, eps: float = 1e-30) -> jnp.ndarray:
    """Closed-form batched 3x3 inverse (adjugate / determinant).

    `jnp.linalg.inv` on (M, 3, 3) lowers to batched LU on TPU, which is
    scalarization-bound for thousands of tiny blocks (the BA point-block
    elimination was ~2.8 ms per LM iteration with it); the cofactor form
    is ~40 fused elementwise VPU ops over the batch. Inputs here are the
    damped point Hessian blocks (symmetric PD by construction), so det
    is bounded away from zero; ``eps`` only guards true degeneracy.
    """
    a, b, c = V[..., 0, 0], V[..., 0, 1], V[..., 0, 2]
    d, e, f = V[..., 1, 0], V[..., 1, 1], V[..., 1, 2]
    g, h, i = V[..., 2, 0], V[..., 2, 1], V[..., 2, 2]
    c00 = e * i - f * h
    c01 = c * h - b * i
    c02 = b * f - c * e
    c10 = f * g - d * i
    c11 = a * i - c * g
    c12 = c * d - a * f
    c20 = d * h - e * g
    c21 = b * g - a * h
    c22 = a * e - b * d
    det = a * c00 + b * c10 + c * c20
    inv_det = jnp.where(jnp.abs(det) > eps, 1.0 / det, 0.0)
    rows = jnp.stack(
        [
            jnp.stack([c00, c01, c02], axis=-1),
            jnp.stack([c10, c11, c12], axis=-1),
            jnp.stack([c20, c21, c22], axis=-1),
        ],
        axis=-2,
    )
    return rows * inv_det[..., None, None]
