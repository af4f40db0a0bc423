"""Loss parity tests: our vectorized jnp losses vs direct torch
transcriptions of the reference's math (losses/self_supervised.py)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from semantic_slam_master_tpu.losses import self_supervised as L


def _unit(rng, *shape):
    v = rng.normal(size=shape).astype(np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_infonce_matches_torch_reference(rng):
    B, N, D, P = 3, 40, 16, 25
    desc1 = _unit(rng, B, N, D)
    desc2 = _unit(rng, B, N, D)
    pairs = rng.integers(0, N, size=(B, P, 2))
    valid = rng.uniform(size=(B, P)) > 0.3
    temp = 0.10

    # --- torch transcription of DescriptorMatchingLoss.forward (:22-71) ---
    t1, t2 = torch.from_numpy(desc1), torch.from_numpy(desc2)
    total, num = 0.0, 0
    for b in range(B):
        idx1 = torch.from_numpy(pairs[b, valid[b], 0])
        idx2 = torch.from_numpy(pairs[b, valid[b], 1])
        if len(idx1) == 0:
            continue
        logits = torch.mm(t1[b][idx1], t2[b].t()) / temp
        logits = torch.clamp(logits, -50, 50)
        loss = F.cross_entropy(logits, idx2)
        total, num = total + loss, num + 1
    ref = (total / num).item()

    ours = L.descriptor_matching_loss(
        jnp.asarray(desc1), jnp.asarray(desc2), jnp.asarray(pairs),
        jnp.asarray(valid), temperature=temp,
    )
    assert np.isclose(float(ours), ref, atol=1e-4), (float(ours), ref)


def test_infonce_fallback_no_pairs(rng):
    desc = jnp.asarray(_unit(rng, 2, 10, 8))
    pairs = jnp.zeros((2, 5, 2), jnp.int32)
    valid = jnp.zeros((2, 5), bool)
    out = L.descriptor_matching_loss(desc, desc, pairs, valid)
    assert np.isclose(float(out), 0.1)  # reference fallback (:71)


def test_variance_loss_matches_torch(rng):
    desc = _unit(rng, 2, 30, 16) * 0.1  # low variance -> hinge active
    t = torch.from_numpy(desc).reshape(-1, 16)
    ref = F.relu(torch.tensor(0.005) - t.var(dim=0).mean()).item()
    ours = L.descriptor_variance_loss(jnp.asarray(desc))
    assert np.isclose(float(ours), ref, atol=1e-6)


def test_decorrelation_loss_matches_torch(rng):
    desc = rng.normal(size=(2, 20, 8)).astype(np.float32)
    t = torch.from_numpy(desc).reshape(-1, 8)
    tc = t - t.mean(dim=0, keepdim=True)
    tn = tc / (tc.std(dim=0, keepdim=True) + 1e-6)
    corr = tn.t() @ tn / 40
    eye = torch.eye(8)
    ref = (((corr - eye) ** 2) * (1 - eye)).sum().item() / (8 * 7)
    ours = L.descriptor_decorrelation_loss(jnp.asarray(desc))
    assert np.isclose(float(ours), ref, atol=1e-5)


def test_repeatability_peakiness_activation(rng):
    s1 = rng.uniform(size=(2, 28, 28, 1)).astype(np.float32)
    s2 = rng.uniform(size=(2, 28, 28, 1)).astype(np.float32)
    t1, t2 = torch.from_numpy(s1), torch.from_numpy(s2)

    ref_rep = F.mse_loss(t1.reshape(2, -1), t2.reshape(2, -1)).item()
    assert np.isclose(float(L.repeatability_loss(jnp.asarray(s1), jnp.asarray(s2))), ref_rep, atol=1e-6)

    var = t1.squeeze(-1).reshape(2, -1).var(dim=1, unbiased=False)
    ref_peak = ((var.mean() - 0.22) ** 2).item()
    assert np.isclose(float(L.peakiness_loss(jnp.asarray(s1))), ref_peak, atol=1e-6)

    ref_act = F.mse_loss(t1.mean(), torch.tensor(0.35)).item()
    assert np.isclose(float(L.activation_loss(jnp.asarray(s1))), ref_act, atol=1e-6)


def test_edge_awareness_matches_torch(rng):
    """Full transcription of EdgeAwarenessLoss.forward (:237-284)."""
    B, H, W, h, w = 2, 56, 56, 28, 28  # integer pooling ratio
    rgb = rng.uniform(size=(B, H, W, 3)).astype(np.float32)
    sal = rng.uniform(size=(B, h, w, 1)).astype(np.float32)

    timg = torch.from_numpy(rgb).permute(0, 3, 1, 2)  # (B,3,H,W)
    tsal = torch.from_numpy(sal)
    gray = 0.299 * timg[:, 0] + 0.587 * timg[:, 1] + 0.114 * timg[:, 2]
    gray = gray.unsqueeze(1)
    sx = torch.tensor([[[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]]], dtype=torch.float32).unsqueeze(0)
    sy = torch.tensor([[[-1, -2, -1], [0, 0, 0], [1, 2, 1]]], dtype=torch.float32).unsqueeze(0)
    gx = F.conv2d(gray, sx, padding=1)
    gy = F.conv2d(gray, sy, padding=1)
    mag = torch.sqrt(gx**2 + gy**2 + 1e-8)
    mag = mag / (mag.max() + 1e-8)
    ed = F.adaptive_avg_pool2d(mag, (h, w))
    ef = ed.reshape(B, -1)
    sf = tsal.squeeze(-1).unsqueeze(1).reshape(B, -1)
    ecc = ef - ef.mean(dim=1, keepdim=True)
    scc = sf - sf.mean(dim=1, keepdim=True)
    corr = (ecc * scc).sum(dim=1) / (
        torch.sqrt((ecc**2).sum(dim=1) * (scc**2).sum(dim=1)) + 1e-8
    )
    ref = (-corr.mean()).item()

    ours = L.edge_awareness_loss(jnp.asarray(sal), jnp.asarray(rgb))
    assert np.isclose(float(ours), ref, atol=1e-4), (float(ours), ref)


def test_sparsity_matches_torch(rng):
    sal = rng.uniform(size=(2, 28, 28, 1)).astype(np.float32)
    t = torch.from_numpy(sal).squeeze(-1)
    gx = t[:, :, 1:] - t[:, :, :-1]
    gy = t[:, 1:, :] - t[:, :-1, :]
    variation = (gx.abs().mean() + gy.abs().mean()) / 2
    ref = (
        F.relu(torch.tensor(0.15) - variation)
        + F.relu((t > 0.6).float().mean() - 0.20) * 2.0
    ).item()
    ours = L.spatial_sparsity_loss(jnp.asarray(sal))
    assert np.isclose(float(ours), ref, atol=1e-6)


def test_total_loss_weights_and_guards(rng):
    B, N, D = 2, 20, 8
    desc = jnp.asarray(_unit(rng, B, N, D))
    sal = jnp.asarray(rng.uniform(size=(B, 8, 8, 1)).astype(np.float32))
    rgb = jnp.asarray(rng.uniform(size=(B, 64, 64, 3)).astype(np.float32))
    pairs = jnp.zeros((B, 4, 2), jnp.int32)
    valid = jnp.ones((B, 4), bool)
    bundle = L.total_loss(desc, desc, pairs, valid, sal, sal, rgb)
    assert set(bundle.components.keys()) == {
        "desc", "variance", "repeat", "peakiness", "activation", "edge", "sparsity"
    }
    manual = sum(
        L.DEFAULT_WEIGHTS[k] * float(v) for k, v in bundle.components.items()
    )
    assert np.isclose(float(bundle.total), manual, rtol=1e-5)
    assert np.isfinite(float(bundle.total))


def test_localization_loss_zero_at_true_correspondence(rng):
    """Perfect matches at the exact reprojection give ~zero loss; a
    2-px perturbation gives a strictly positive one with a usable
    gradient toward the true position."""
    import jax

    B, K = 2, 16
    H = W = 64
    fx = fy = 80.0
    cx = cy = 32.0
    Km = jnp.asarray([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], jnp.float32)

    uv1 = jnp.asarray(
        rng.uniform(8, 56, size=(B, K, 2)).astype(np.float32)
    )
    depth = jnp.full((B, H, W), 2.0, jnp.float32)

    # Relative pose: small rotation + translation.
    from semantic_slam_master_tpu.core import lie

    tw = jnp.asarray([0.02, -0.01, 0.015, 0.05, -0.03, 0.02], jnp.float32)
    T = lie.se3_exp(tw)
    T21 = jnp.broadcast_to(T, (B, 4, 4))

    # True correspondences by forward warp.
    d = 2.0
    x1 = (uv1[..., 0] - cx) / fx * d
    y1 = (uv1[..., 1] - cy) / fy * d
    X1 = jnp.stack([x1, y1, jnp.full_like(x1, d)], -1)
    X2 = jnp.einsum("ij,bkj->bki", T[:3, :3], X1) + T[:3, 3]
    uv2 = jnp.stack(
        [
            fx * X2[..., 0] / X2[..., 2] + cx,
            fy * X2[..., 1] / X2[..., 2] + cy,
        ],
        -1,
    )
    valid = jnp.ones((B, K), bool)

    loss0 = L.localization_loss(uv1, uv2, valid, depth, Km, T21)
    assert float(loss0) < 1e-3

    loss2 = L.localization_loss(uv1, uv2 + 2.0, valid, depth, Km, T21)
    assert float(loss2) > 0.5  # ~2.8 px residual under Huber

    # Gradient w.r.t. uv1 points the residual downhill (nonzero, finite).
    g = jax.grad(
        lambda u: L.localization_loss(u, uv2 + 2.0, valid, depth, Km, T21)
    )(uv1)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 1e-4

    # Invalid matches and holes (depth 0) are excluded -> loss 0.
    lossm = L.localization_loss(
        uv1, uv2 + 50.0, valid, jnp.zeros_like(depth), Km, T21
    )
    assert float(lossm) == 0.0

    # Per-frame intrinsics (K2): frame 2 cropped with a shifted window
    # moves its principal point; correspondences expressed in the
    # shifted frame are exact ONLY when K2 carries the shift (the
    # crop-jitter augmentation contract, cli/train_cli.crop_item).
    shift = jnp.asarray([5.0, -3.0], jnp.float32)
    K2 = Km.at[0, 2].add(shift[0]).at[1, 2].add(shift[1])
    loss_k2 = L.localization_loss(
        uv1, uv2 + shift, valid, depth, Km, T21, K2=K2
    )
    assert float(loss_k2) < 1e-3
    loss_wrong = L.localization_loss(uv1, uv2 + shift, valid, depth, Km, T21)
    assert float(loss_wrong) > 0.5

    # GT-warp pairing (gt_match_pairs): with frame-2 keypoints equal to
    # the exact reprojections under a permutation, every frame-1
    # keypoint pairs with its permuted correspondent; a far-away row is
    # invalid.
    perm = np.asarray([(k + 3) % K for k in range(K)])
    uv2_perm = uv2[:, perm, :]
    v2 = jnp.ones((B, K), bool)
    pairs, pv = L.gt_match_pairs(
        uv1, uv2_perm, valid, v2, depth, Km, T21, radius=3.0
    )
    j = np.asarray(pairs[..., 1])
    assert np.all(j[:, perm] == np.arange(K)) or np.all(
        perm[j] == np.arange(K)
    )
    assert bool(np.all(np.asarray(pv)))
    far = uv2_perm + 50.0
    _, pv_far = L.gt_match_pairs(
        uv1, far, valid, v2, depth, Km, T21, radius=3.0
    )
    assert not np.any(np.asarray(pv_far))


def test_hard_loss_reduces_to_plain_infonce(rng):
    """With all negatives allowed and no cross-image pool, the CE half of
    the hard loss is EXACTLY descriptor_matching_loss (same math)."""
    B, N, D, P = 3, 40, 16, 25
    desc1 = jnp.asarray(_unit(rng, B, N, D))
    desc2 = jnp.asarray(_unit(rng, B, N, D))
    pairs = jnp.asarray(rng.integers(0, N, size=(B, P, 2)))
    valid = jnp.asarray(rng.uniform(size=(B, P)) > 0.3)
    plain = L.descriptor_matching_loss(desc1, desc2, pairs, valid)
    ce, _ = L.descriptor_matching_loss_hard(
        desc1, desc2, pairs, valid,
        neg_ok=jnp.ones((B, P, N), bool), cross_image=False,
    )
    assert np.isclose(float(ce), float(plain), atol=1e-5)


def test_hard_loss_safe_radius_excludes_lookalike(rng):
    """A lookalike descriptor (identical to the anchor) next to the true
    correspondence poisons plain InfoNCE; masking it via neg_ok removes
    the penalty and zeroes the margin term."""
    B, N, D = 1, 8, 16
    desc2 = jnp.asarray(_unit(rng, B, N, D))
    # anchor = the target descriptor; lookalike at index 1 = same vector
    desc2 = desc2.at[0, 1].set(desc2[0, 0])
    desc1 = desc2
    pairs = jnp.asarray([[[0, 0]]], jnp.int32)  # anchor 0 -> target 0
    valid = jnp.ones((1, 1), bool)

    all_ok = jnp.ones((B, 1, N), bool)
    ce_poisoned, hard_poisoned = L.descriptor_matching_loss_hard(
        desc1, desc2, pairs, valid, all_ok, cross_image=False
    )
    masked = all_ok.at[0, 0, 1].set(False)  # lookalike inside safe radius
    ce_clean, hard_clean = L.descriptor_matching_loss_hard(
        desc1, desc2, pairs, valid, masked, cross_image=False
    )
    # identical lookalike -> CE >= ln 2, margin = full hard_margin
    assert float(ce_poisoned) > float(ce_clean) + 0.5
    assert np.isclose(float(hard_poisoned), 0.2, atol=1e-5)
    assert float(hard_clean) < float(hard_poisoned)


def test_hard_loss_cross_image_negatives(rng):
    """A lookalike in ANOTHER batch image only raises the loss when
    cross_image=True."""
    B, N, D = 2, 8, 16
    desc2 = jnp.asarray(_unit(rng, B, N, D))
    desc2 = desc2.at[1, 3].set(desc2[0, 0])  # image-1 lookalike of image-0 target
    desc1 = desc2
    pairs = jnp.zeros((B, 1, 2), jnp.int32)
    valid = jnp.asarray([[True], [False]])
    neg_ok = jnp.ones((B, 1, N), bool)

    ce_off, hard_off = L.descriptor_matching_loss_hard(
        desc1, desc2, pairs, valid, neg_ok, cross_image=False
    )
    ce_on, hard_on = L.descriptor_matching_loss_hard(
        desc1, desc2, pairs, valid, neg_ok, cross_image=True
    )
    assert float(ce_on) > float(ce_off) + 0.3
    assert float(hard_on) > float(hard_off)


def test_gt_match_pairs_safe_radius_mask(rng):
    """safe_radius returns a negative mask: frame-2 keypoints within the
    radius of the warp are excluded (False), far ones allowed (True)."""
    B, K = 1, 4
    H = W = 64
    Km = jnp.asarray([[80.0, 0, 32], [0, 80.0, 32], [0, 0, 1]], jnp.float32)
    uv1 = jnp.asarray([[[20.0, 20.0], [40.0, 40.0], [20.0, 40.0], [40.0, 20.0]]])
    depth = jnp.full((B, H, W), 2.0, jnp.float32)
    T = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))
    # identity pose -> warp = uv1; frame-2 keypoints AT uv1
    uv2 = uv1
    v = jnp.ones((B, K), bool)
    pairs, pv, neg_ok = L.gt_match_pairs(
        uv1, uv2, v, v, depth, Km, T, radius=3.0, safe_radius=12.0
    )
    m = np.asarray(neg_ok[0])
    # each keypoint: its own position (dist 0) masked out; the others
    # are >= 20 px away -> allowed
    assert not np.any(np.diag(m))
    assert np.all(m[~np.eye(K, dtype=bool)])
    assert bool(np.all(np.asarray(pv)))


def test_total_loss_hard_component_weighted(rng):
    B, N, D = 2, 20, 8
    desc = jnp.asarray(_unit(rng, B, N, D))
    sal = jnp.asarray(rng.uniform(size=(B, 8, 8, 1)).astype(np.float32))
    rgb = jnp.asarray(rng.uniform(size=(B, 64, 64, 3)).astype(np.float32))
    pairs = jnp.zeros((B, 4, 2), jnp.int32)
    valid = jnp.ones((B, 4), bool)
    neg_ok = jnp.ones((B, 4, N), bool)
    bundle = L.total_loss(
        desc, desc, pairs, valid, sal, sal, rgb,
        weights={"hard": 2.0}, neg_ok=neg_ok, valid2=jnp.ones((B, N), bool),
    )
    assert "hard" in bundle.components
    w = dict(L.DEFAULT_WEIGHTS, hard=2.0)
    manual = sum(w[k] * float(v) for k, v in bundle.components.items())
    assert np.isclose(float(bundle.total), manual, rtol=1e-5)
