"""The self-supervised training losses, vectorized and mask-correct.

Functional re-design of the reference's 8 loss modules
(`semantic-slam/losses/self_supervised.py`) with identical math and
default constants, but no per-image Python loops: the InfoNCE loss is
one masked batched cross-entropy over padded match lists (SURVEY.md
§7.3 — "the reference's InfoNCE loops per-image; ours must be one
masked batched CE").

Default weights follow `configs/train_config.yaml:53-60`:
desc 8.0, repeat 0.3, variance 0.5, peakiness 0.1, activation 0.05,
edge 0.3, sparsity 0.3.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.image import avg_pool_to, rgb_to_gray, sobel_magnitude

DEFAULT_WEIGHTS: Dict[str, float] = {
    "desc": 8.0,
    "repeat": 0.3,
    "variance": 0.5,
    "peakiness": 0.1,
    "activation": 0.05,
    "edge": 0.3,
    "sparsity": 0.3,
}


def descriptor_matching_loss(
    desc1: jnp.ndarray,
    desc2: jnp.ndarray,
    pairs: jnp.ndarray,
    pair_valid: jnp.ndarray,
    temperature: float = 0.10,
    fallback: float = 0.1,
) -> jnp.ndarray:
    """InfoNCE over matched descriptor pairs (reference
    `DescriptorMatchingLoss`, `self_supervised.py:11-71`).

    desc1/desc2: (B, N, D) L2-normalized. pairs: (B, P, 2) int indices
    (i into desc1, j into desc2). pair_valid: (B, P).

    For each valid pair, logits = <desc1_i, all desc2> / T clamped to
    ±50, CE with target j; mean over valid pairs per image, then mean
    over images that have >= 1 valid pair; `fallback` when none at all.
    """
    B, N, D = desc1.shape
    i_idx = pairs[..., 0]
    j_idx = pairs[..., 1]

    anchors = jnp.take_along_axis(desc1, i_idx[..., None], axis=1)  # (B, P, D)
    logits = jnp.einsum("bpd,bnd->bpn", anchors, desc2) / temperature
    logits = jnp.clip(logits, -50.0, 50.0)
    logz = jnp.log(jnp.sum(jnp.exp(logits - logits.max(-1, keepdims=True)), -1))
    logz = logz + logits.max(-1)
    target_logit = jnp.take_along_axis(logits, j_idx[..., None], axis=-1)[..., 0]
    ce = logz - target_logit  # (B, P)

    m = pair_valid.astype(ce.dtype)
    per_image = jnp.sum(ce * m, axis=-1) / jnp.maximum(jnp.sum(m, axis=-1), 1.0)
    has_pairs = jnp.sum(m, axis=-1) > 0
    num_valid_images = jnp.sum(has_pairs)
    mean_loss = jnp.sum(jnp.where(has_pairs, per_image, 0.0)) / jnp.maximum(
        num_valid_images, 1
    )
    return jnp.where(num_valid_images > 0, mean_loss, fallback)


def descriptor_matching_loss_hard(
    desc1: jnp.ndarray,
    desc2: jnp.ndarray,
    pairs: jnp.ndarray,
    pair_valid: jnp.ndarray,
    neg_ok: jnp.ndarray,
    valid2: Optional[jnp.ndarray] = None,
    temperature: float = 0.10,
    cross_image: bool = True,
    hard_margin: float = 0.2,
    fallback: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """InfoNCE with hard-negative mining (TPU-build extension; round-3
    verdict ask #1b — the trained descriptor's misses are *confident
    lookalike-texture matches*, which plain in-frame InfoNCE never
    pressures away).

    Three upgrades over :func:`descriptor_matching_loss`:

    1. **Spatial safe-radius masking** (``neg_ok``, (B, P, N) bool): a
       frame-2 keypoint a few pixels from the true correspondence sees
       nearly the same 3D surface, so punishing its similarity teaches
       noise, not discrimination (R2D2/D2-Net both exclude a
       neighborhood around the positive). Callers build ``neg_ok`` from
       the GT warp distance (see :func:`gt_match_pairs` ``safe_radius``).
    2. **Cross-image negatives**: every valid frame-2 descriptor from
       the *other* batch images joins the negative pool. Lookalike
       textures from other rooms are exactly the confusions the
       acceptance harness counts as outliers.
    3. **Hardest-negative margin** (second return): mean
       ``relu(margin - pos_sim + max_neg_sim)`` over valid pairs — a
       direct penalty on the single most confusing negative, which CE's
       softmax dilutes once it is merely one of thousands.

    desc1/desc2: (B, N, D) L2-normalized. pairs: (B, P, 2) int [i, j].
    pair_valid: (B, P). Returns (ce_loss, hard_margin_loss), both
    reduced like :func:`descriptor_matching_loss` (mean over valid
    pairs per image, then over images with >= 1 valid pair).
    """
    B, N, D = desc2.shape
    i_idx = pairs[..., 0]
    j_idx = pairs[..., 1]
    anchors = jnp.take_along_axis(desc1, i_idx[..., None], axis=1)  # (B, P, D)

    sims = jnp.einsum("bpd,bnd->bpn", anchors, desc2)  # (B, P, N)
    pos = jnp.take_along_axis(sims, j_idx[..., None], axis=-1)[..., 0]  # (B, P)

    tgt = jax.nn.one_hot(j_idx, N, dtype=bool)  # (B, P, N)
    allowed = neg_ok & ~tgt
    if valid2 is not None:
        allowed = allowed & valid2[:, None, :]

    def _logits(s):
        return jnp.clip(s / temperature, -50.0, 50.0)

    neg_logits = jnp.where(allowed, _logits(sims), -1e9)
    pos_logit = _logits(pos)
    logit_list = [pos_logit[..., None], neg_logits]
    neg_sims = jnp.where(allowed, sims, -1.0)
    max_neg = neg_sims.max(axis=-1)  # (B, P)

    if cross_image and B > 1:
        cross = jnp.einsum("bpd,cnd->bpcn", anchors, desc2)  # (B, P, B, N)
        other = ~jnp.eye(B, dtype=bool)  # exclude own image (handled above)
        allow_c = other[:, None, :, None]
        if valid2 is not None:
            allow_c = allow_c & valid2[None, None, :, :]
        cl = jnp.where(allow_c, _logits(cross), -1e9)
        logit_list.append(cl.reshape(B, pairs.shape[1], B * N))
        max_neg = jnp.maximum(
            max_neg, jnp.where(allow_c, cross, -1.0).max(axis=(-2, -1))
        )

    all_logits = jnp.concatenate(logit_list, axis=-1)
    mx = all_logits.max(axis=-1, keepdims=True)
    logz = jnp.log(jnp.sum(jnp.exp(all_logits - mx), axis=-1)) + mx[..., 0]
    ce = logz - pos_logit  # (B, P)
    hard = jnp.maximum(hard_margin - pos + max_neg, 0.0)  # (B, P)

    m = pair_valid.astype(ce.dtype)
    cnt = jnp.maximum(jnp.sum(m, axis=-1), 1.0)
    has_pairs = jnp.sum(m, axis=-1) > 0
    n_img = jnp.maximum(jnp.sum(has_pairs), 1)

    def _reduce(x, fb):
        per_image = jnp.sum(x * m, axis=-1) / cnt
        mean = jnp.sum(jnp.where(has_pairs, per_image, 0.0)) / n_img
        return jnp.where(jnp.sum(has_pairs) > 0, mean, fb)

    return _reduce(ce, fallback), _reduce(hard, 0.0)


def descriptor_variance_loss(
    descriptors: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
    min_variance: float = 0.005,
) -> jnp.ndarray:
    """Hinge on mean per-dimension variance (anti-collapse;
    `self_supervised.py:74-118`). descriptors: (B, N, D)."""
    B, N, D = descriptors.shape
    flat = descriptors.reshape(B * N, D)
    if valid is None:
        # unbiased variance, like torch.var default (`:108`)
        mean = flat.mean(axis=0)
        var = jnp.sum((flat - mean) ** 2, axis=0) / jnp.maximum(B * N - 1, 1)
    else:
        m = valid.reshape(B * N).astype(flat.dtype)
        cnt = jnp.maximum(jnp.sum(m), 2.0)
        mean = jnp.sum(flat * m[:, None], axis=0) / cnt
        var = jnp.sum(((flat - mean) ** 2) * m[:, None], axis=0) / (cnt - 1.0)
    return jnp.maximum(min_variance - var.mean(), 0.0)


def descriptor_decorrelation_loss(descriptors: jnp.ndarray) -> jnp.ndarray:
    """Barlow-Twins-style off-diagonal penalty (optional in the reference,
    `self_supervised.py:121-164`)."""
    B, N, D = descriptors.shape
    flat = descriptors.reshape(B * N, D)
    centered = flat - flat.mean(axis=0, keepdims=True)
    # unbiased std, matching torch.std default in the reference (:149)
    std = centered.std(axis=0, keepdims=True, ddof=1) + 1e-6
    normed = centered / std
    corr = normed.T @ normed / (B * N)
    off = (corr - jnp.eye(D)) ** 2
    mask = 1.0 - jnp.eye(D)
    return jnp.sum(off * mask) / (D * (D - 1))


def repeatability_loss(saliency1: jnp.ndarray, saliency2: jnp.ndarray) -> jnp.ndarray:
    """MSE between the two frames' saliency maps (`:167-183`)."""
    return jnp.mean((saliency1 - saliency2) ** 2)


def peakiness_loss(
    saliency: jnp.ndarray, target_variance: float = 0.22
) -> jnp.ndarray:
    """(mean per-image variance - target)^2 (`:186-200`, biased var)."""
    B = saliency.shape[0]
    flat = saliency.reshape(B, -1)
    var = flat.var(axis=1)
    return (var.mean() - target_variance) ** 2


def activation_loss(saliency: jnp.ndarray, target_mean: float = 0.35) -> jnp.ndarray:
    """(global mean saliency - target)^2 (`:203-214`)."""
    return (saliency.mean() - target_mean) ** 2


def edge_awareness_loss(
    saliency: jnp.ndarray, images: jnp.ndarray
) -> jnp.ndarray:
    """Negative Pearson correlation between saliency and pooled Sobel edge
    magnitude (`:217-284`). saliency: (B, h, w[, 1]); images: (B, H, W, 3)
    channels-last [0-1-ish normalized RGB]."""
    if saliency.ndim == 4:
        saliency = saliency[..., 0]
    B, h, w = saliency.shape
    gray = rgb_to_gray(images)  # (B, H, W)
    edge = sobel_magnitude(gray)
    edge = edge / (edge.max() + 1e-8)  # global max, like the reference (:257)
    edge_small = avg_pool_to(edge, h, w)

    e = edge_small.reshape(B, -1)
    s = saliency.reshape(B, -1)
    ec = e - e.mean(axis=1, keepdims=True)
    sc = s - s.mean(axis=1, keepdims=True)
    corr = jnp.sum(ec * sc, axis=1) / (
        jnp.sqrt(jnp.sum(ec**2, axis=1) * jnp.sum(sc**2, axis=1)) + 1e-8
    )
    return -corr.mean()


def spatial_sparsity_loss(
    saliency: jnp.ndarray,
    target_variation: float = 0.15,
    high_threshold: float = 0.6,
    max_high_ratio: float = 0.20,
    penalty_weight: float = 2.0,
) -> jnp.ndarray:
    """Spatial-gradient hinge + high-saliency-ratio penalty (`:287-313`)."""
    if saliency.ndim == 4:
        saliency = saliency[..., 0]
    gx = saliency[:, :, 1:] - saliency[:, :, :-1]
    gy = saliency[:, 1:, :] - saliency[:, :-1, :]
    variation = (jnp.abs(gx).mean() + jnp.abs(gy).mean()) / 2.0
    sparsity = jnp.maximum(target_variation - variation, 0.0)
    high_ratio = (saliency > high_threshold).mean()
    penalty = jnp.maximum(high_ratio - max_high_ratio, 0.0) * penalty_weight
    return sparsity + penalty


def warp_points_depth(
    uv1: jnp.ndarray,
    depth1: jnp.ndarray,
    K: jnp.ndarray,
    T_21: jnp.ndarray,
    K2: jnp.ndarray | None = None,
    min_depth: float = 0.05,
):
    """Reproject frame-1 pixels into frame 2 through measured depth and
    the relative pose (differentiable w.r.t. uv1 except through the
    nearest-sampled depth).

    uv1: (B, K, 2) frame-1 pixels; depth1: (B, H, W) metric depth;
    K / K2: (3, 3) or (B, 3, 3) per-frame intrinsics (K2 defaults to K);
    T_21: (B, 4, 4). Returns ((B, K, 2) warped pixels, (B, K) validity:
    positive depth, in front of camera 2, inside frame 2).
    """
    from ..ops.sampling import nearest_sample

    B = uv1.shape[0]
    H, W = depth1.shape[-2:]
    d = nearest_sample(depth1, uv1)  # (B, K); grad-free in position
    K = jnp.broadcast_to(jnp.asarray(K, uv1.dtype), (B, 3, 3))
    Kinv_x = (uv1[..., 0] - K[:, None, 0, 2]) / K[:, None, 0, 0]
    Kinv_y = (uv1[..., 1] - K[:, None, 1, 2]) / K[:, None, 1, 1]
    X1 = jnp.stack([Kinv_x * d, Kinv_y * d, d], axis=-1)  # (B, K, 3)
    R = T_21[:, :3, :3].astype(uv1.dtype)
    t = T_21[:, :3, 3].astype(uv1.dtype)
    X2 = jnp.einsum("bij,bkj->bki", R, X1) + t[:, None, :]
    z2 = X2[..., 2]
    z_safe = jnp.where(z2 > min_depth, z2, 1.0)
    Kp = K if K2 is None else jnp.broadcast_to(
        jnp.asarray(K2, uv1.dtype), (B, 3, 3)
    )
    u2 = Kp[:, None, 0, 0] * X2[..., 0] / z_safe + Kp[:, None, 0, 2]
    v2 = Kp[:, None, 1, 1] * X2[..., 1] / z_safe + Kp[:, None, 1, 2]
    ok = (
        (d > min_depth)
        & (z2 > min_depth)
        & (u2 >= 0.0)
        & (u2 <= W - 1.0)
        & (v2 >= 0.0)
        & (v2 <= H - 1.0)
    )
    return jnp.stack([u2, v2], axis=-1), ok


def gt_match_pairs(
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    valid1: jnp.ndarray,
    valid2: jnp.ndarray,
    depth1: jnp.ndarray,
    K: jnp.ndarray,
    T_21: jnp.ndarray,
    K2: jnp.ndarray | None = None,
    radius: float = 6.0,
    safe_radius: float | None = None,
) -> tuple:
    """GT-warp correspondence pairing (TPU-build synthetic-recipe
    extension; see train.config.LossConfig.gt_supervision): each frame-1
    keypoint is paired with the nearest frame-2 keypoint to its
    depth+pose reprojection, valid when within ``radius`` px. One
    (B, K, K) distance matrix — no host loops.

    Returns ((B, K, 2) int32 [i, j] pairs, (B, K) validity). With
    ``safe_radius`` set, also returns a (B, K1, K2) bool negative mask
    for :func:`descriptor_matching_loss_hard`: frame-2 keypoints
    farther than ``safe_radius`` px from the warped GT position (near
    ones see almost the same surface — not legitimate negatives).
    """
    warped, ok = warp_points_depth(uv1, depth1, K, T_21, K2=K2)
    d2 = jnp.sum(
        (warped[:, :, None, :] - uv2[:, None, :, :]) ** 2, axis=-1
    )  # (B, K1, K2)
    d2 = jnp.where(valid2[:, None, :], d2, jnp.inf)
    j = jnp.argmin(d2, axis=-1)  # (B, K1)
    dmin = jnp.min(d2, axis=-1)
    pair_valid = valid1 & ok & (dmin <= radius * radius)
    B, Kn = j.shape
    i = jnp.broadcast_to(jnp.arange(Kn, dtype=jnp.int32), (B, Kn))
    pairs = jnp.stack([i, j.astype(jnp.int32)], axis=-1)
    if safe_radius is None:
        return pairs, pair_valid
    # For keypoints whose warp left the frame (ok=False) the distances
    # are meaningless, but those rows are pair-invalid and contribute
    # nothing to the loss anyway.
    neg_ok = d2 > safe_radius * safe_radius
    return pairs, pair_valid, neg_ok


def localization_loss(
    uv1: jnp.ndarray,
    uv2_matched: jnp.ndarray,
    valid: jnp.ndarray,
    depth1: jnp.ndarray,
    K: jnp.ndarray,
    T_21: jnp.ndarray,
    huber_delta: float = 4.0,
    min_depth: float = 0.05,
    max_residual: float | None = None,
    K2: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Warp-consistency localization loss (TPU-build extension).

    The reference's loss stack is position-blind: keypoints are pinned to
    16 px patch centers (`dino_backbone.py:154-165`) and no loss touches
    *where* a keypoint lands, which is why its spacing-5 repeatability
    collapses at the patch pitch. With sub-patch soft-argmax refinement
    (`models/frontend.OffsetHead`) positions become continuous and
    differentiable — this loss supplies the missing signal: warp each
    refined frame-1 keypoint into frame 2 through its measured depth and
    the pair's ground-truth relative pose (the same supervision the
    reference already uses to *score* repeatability,
    `test_repeatability.py:178-192`, here with full depth reprojection
    instead of the rotation-only homography), and Huber-penalize the
    pixel distance to its descriptor-matched frame-2 keypoint.

    uv1: (B, K, 2) refined frame-1 pixel coords (differentiable).
    uv2_matched: (B, K, 2) pixel coords of each keypoint's mutual-NN
        match in frame 2 (differentiable).
    valid: (B, K) match validity.
    depth1: (B, H, W) metric depth for frame 1.
    K: (3, 3) or (B, 3, 3) frame-1 intrinsics at the training resolution.
    T_21: (B, 4, 4) camera-2-from-camera-1 relative pose.
    K2: frame-2 intrinsics when the two frames were cropped with
        DIFFERENT windows (the sub-patch phase augmentation the
        OffsetHead needs — same-window pairs only ever demand
        corrections as large as the tiny inter-frame flow, and the head
        converges to ~zero offsets); defaults to K.
    Returns mean Huber reprojection error in pixels over valid matches.
    """
    warped, ok_w = warp_points_depth(
        uv1, depth1, K, T_21, K2=K2, min_depth=min_depth
    )
    ok = valid & ok_w
    r = jnp.sqrt(
        jnp.sum((warped - uv2_matched) ** 2, axis=-1) + 1e-12
    )
    if max_residual is not None:
        # Descriptor mismatches produce arbitrarily large residuals whose
        # Huber-linear gradients drown the sub-patch signal (true
        # correspondence errors are bounded by flow + one patch pitch);
        # exclude them instead of averaging them in.
        ok = ok & (r < max_residual)
    hub = jnp.where(
        r < huber_delta, 0.5 * r**2 / huber_delta, r - 0.5 * huber_delta
    )
    ok_f = ok.astype(uv1.dtype)
    return jnp.sum(hub * ok_f) / jnp.maximum(jnp.sum(ok_f), 1.0)


class LossBundle(NamedTuple):
    total: jnp.ndarray
    components: Dict[str, jnp.ndarray]


def total_loss(
    desc1: jnp.ndarray,
    desc2: jnp.ndarray,
    pairs: jnp.ndarray,
    pair_valid: jnp.ndarray,
    saliency1: jnp.ndarray,
    saliency2: jnp.ndarray,
    rgb1: jnp.ndarray,
    weights: Dict[str, float] | None = None,
    temperature: float = 0.10,
    min_variance: float = 0.005,
    target_variance: float = 0.22,
    target_mean: float = 0.35,
    sparsity_penalty: float = 2.0,
    neg_ok: Optional[jnp.ndarray] = None,
    valid2: Optional[jnp.ndarray] = None,
    cross_image: bool = True,
    hard_margin: float = 0.2,
) -> LossBundle:
    """The reference's weighted 7-loss combination (`train.py:331-381`)
    with its per-loss NaN fallbacks expressed as `where` guards.

    With ``neg_ok`` set, the desc term switches to
    :func:`descriptor_matching_loss_hard` (safe-radius + cross-image
    negatives) and a ``hard`` hardest-negative margin component is added
    under ``weights['hard']`` (default 0 — opt-in)."""
    w = dict(DEFAULT_WEIGHTS)
    if weights:
        w.update(weights)

    def guard(x, fb):
        return jnp.where(jnp.isfinite(x), x, jnp.asarray(fb, x.dtype))

    if neg_ok is not None:
        ce, hard = descriptor_matching_loss_hard(
            desc1,
            desc2,
            pairs,
            pair_valid,
            neg_ok,
            valid2=valid2,
            temperature=temperature,
            cross_image=cross_image,
            hard_margin=hard_margin,
        )
        desc_term = guard(ce, 0.1)
        hard_term = guard(hard, 0.0)
    else:
        desc_term = guard(
            descriptor_matching_loss(desc1, desc2, pairs, pair_valid, temperature),
            0.1,
        )
        hard_term = None

    comps = {
        "desc": desc_term,
        "variance": guard(descriptor_variance_loss(desc1, min_variance=min_variance), 0.0),
        "repeat": guard(repeatability_loss(saliency1, saliency2), 0.0),
        "peakiness": guard(peakiness_loss(saliency1, target_variance), 0.0),
        "activation": guard(activation_loss(saliency1, target_mean), 0.0),
        "edge": guard(edge_awareness_loss(saliency1, rgb1), 0.0),
        "sparsity": guard(
            spatial_sparsity_loss(saliency1, penalty_weight=sparsity_penalty), 0.0
        ),
    }
    if hard_term is not None:
        comps["hard"] = hard_term
    total = sum(w.get(k, 0.0) * comps[k] for k in comps)
    return LossBundle(total=total, components=comps)
