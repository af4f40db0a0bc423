"""RGB-D frame-to-frame tracking (visual odometry).

Config 3 of the capability ladder (BASELINE.json): PnP + Gauss-Newton
pose refinement over ORB matches between consecutive frames. The
frontend (detect/describe) is embarrassingly parallel and runs batched
over *all* frames first; the cheap sequential pose chain is a
`lax.scan` over per-frame features — the decomposition SURVEY.md §2.3
prescribes for TPU ("frame-pipeline parallelism ... sequentially-
dependent tracking state remains a small per-sequence carry").
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie
from ..core.camera import PinholeCamera, backproject
from ..ops import fast, image, matching, orb
from ..ops.sampling import nearest_sample
from . import pnp


class FrameFeatures(NamedTuple):
    """Per-frame frontend output, batched over frames (F leading axis).

    ``desc`` is either packed-bit ORB ((F, N, 8) uint32, Hamming-matched)
    or learned float descriptors ((F, N, D) float, cosine-matched) — the
    SLAM backend dispatches on dtype (slam.system.match_features).
    """

    xy: jnp.ndarray  # (F, N, 2)
    desc: jnp.ndarray  # (F, N, 8) uint32 ORB or (F, N, D) float learned
    depth: jnp.ndarray  # (F, N) metric depth at keypoints
    valid: jnp.ndarray  # (F, N)
    score: jnp.ndarray  # (F, N)
    sem_weight: jnp.ndarray  # (F, N) semantic/confidence residual weight


def build_pyramid(
    gray: jnp.ndarray, num_levels: int, scale_factor: float = 1.2
) -> list:
    """Successively-resized image pyramid (level 0 = input). Heights are
    rounded to multiples of 8 (the detector's two-stage block top-k
    needs /8); widths to multiples of 32 so every level hits the
    matmul-structured describe path (`orb.describe` falls back to the
    scalarized-gather path on non-32-aligned widths — measured ~2x
    slower per level on TPU). Static shapes: the pyramid geometry is
    fixed at trace time."""
    levels = [gray]
    B, H, W = gray.shape
    for i in range(1, num_levels):
        h = max(int(round(H / scale_factor**i / 8)) * 8, 24)
        w = max(int(round(W / scale_factor**i / 32)) * 32, 32)
        levels.append(
            jax.image.resize(levels[-1], (B, h, w), method="bilinear")
        )
    return levels


def extract_features(
    gray: jnp.ndarray,
    depth: jnp.ndarray,
    num_keypoints: int = 512,
    threshold: float = 0.05,
    nms_radius: int = 3,
    weight_map: jnp.ndarray | None = None,
    num_levels: int = 4,
    scale_factor: float = 1.2,
    subpixel: bool = True,
) -> FrameFeatures:
    """Batched multi-scale ORB frontend: (F, H, W) gray + depth ->
    FrameFeatures.

    Scale invariance via an image pyramid (ORB-SLAM runs 8 levels at
    factor 1.2, `baselines/pyslam/scripts/setup.sh:69-70`; default here
    is 4 — forward-motion scale drift on TUM is well inside 1.2^3): each
    level gets an area-proportional keypoint quota, is detected and
    described at its own resolution, and coordinates map back to level 0.
    Per-level work is a statically-unrolled loop of fixed-shape ops — the
    XLA-friendly form of the reference baselines' pyramid loops.

    Keypoints with invalid (zero) depth stay in the arrays but are
    masked — fixed shapes throughout. ``weight_map`` is an optional
    per-pixel semantic residual weight (F, Hm, Wm) — e.g. from
    ``models.segmenter.class_weights_map`` — sampled at keypoints into
    ``sem_weight`` (the north-star "semantic labels weighting the
    reprojection residuals" hook). The map may be LOWER resolution than
    the frame (the segmenter's production path emits 1/4-res maps);
    keypoint coordinates are rescaled to the map's grid before sampling.
    """
    levels = build_pyramid(gray, num_levels, scale_factor)
    areas = np.array([p.shape[1] * p.shape[2] for p in levels], dtype=np.float64)
    quotas = np.maximum((num_keypoints * areas / areas.sum()).astype(int), 1)
    quotas[0] += num_keypoints - int(quotas.sum())

    xys, descs, scores, valids = [], [], [], []
    H0, W0 = gray.shape[1:]
    for lvl, (img, quota) in enumerate(zip(levels, quotas)):
        # Sub-pixel geometric coordinates (fast.refine_subpixel) sharpen
        # PnP/BA residuals; descriptors still sample the pixel grid.
        if weight_map is not None:
            # Semantic detection bias: spend the fixed keypoint budget on
            # static classes first (a person-dominated frame otherwise
            # fills the budget with dynamic corners and starves PnP of
            # static support). Nearest resize keeps exact class weights.
            w_lvl = jax.image.resize(
                weight_map, (img.shape[0],) + img.shape[1:], method="nearest"
            )
        else:
            w_lvl = None
        kp = fast.detect(img, int(quota), threshold, nms_radius,
                         subpixel=subpixel, score_weight=w_lvl)
        blurred = image.gaussian_blur(img, sigma=2.0, radius=3)
        desc = orb.describe(blurred, kp.xy, prefiltered=True)
        # Map to level-0 pixels via the ACTUAL resize ratio (shapes are
        # rounded to /8, so don't assume scale_factor**lvl exactly).
        ry = (H0 - 1) / max(img.shape[1] - 1, 1)
        rx = (W0 - 1) / max(img.shape[2] - 1, 1)
        xys.append(kp.xy * jnp.asarray([rx, ry], kp.xy.dtype))
        descs.append(desc)
        scores.append(kp.score)
        valids.append(kp.valid)

    xy = jnp.concatenate(xys, axis=1)
    desc = jnp.concatenate(descs, axis=1)
    score = jnp.concatenate(scores, axis=1)
    kp_valid = jnp.concatenate(valids, axis=1)

    d = nearest_sample(depth, xy)
    valid = kp_valid & (d > 0.05) & (d < 15.0)
    if weight_map is None:
        sem_w = jnp.ones_like(d)
    else:
        Hm, Wm = weight_map.shape[1], weight_map.shape[2]
        if (Hm, Wm) != (H0, W0):
            # Pixel-center-aligned rescale onto the low-res map's grid.
            scale = jnp.asarray([Wm / W0, Hm / H0], xy.dtype)
            xy_m = (xy + 0.5) * scale - 0.5
        else:
            xy_m = xy
        sem_w = nearest_sample(weight_map, xy_m)
    return FrameFeatures(
        xy=xy, desc=desc, depth=d, valid=valid, score=score, sem_weight=sem_w
    )


def extract_learned_features(
    model,
    variables,
    rgb: jnp.ndarray,
    depth: jnp.ndarray,
    weight_map: jnp.ndarray | None = None,
    use_confidence: bool = True,
    normalized: bool = False,
) -> FrameFeatures:
    """Learned-frontend -> FrameFeatures adapter: lets a trained
    LearnedFrontend drive the SAME SLAM backend as the classic ORB path
    (the reference's `extract_features` contract feeding full SLAM,
    `semantic-slam/test/test_tracking.py:68-85` — which the reference
    itself never connects to a SLAM system).

    rgb: (F, H, W, 3) in [0, 1] (or already ImageNet-normalized if
    ``normalized``); depth: (F, H, W) meters at the SAME resolution.
    Descriptors come out float (cosine-matched downstream); confidence
    from the uncertainty head becomes ``sem_weight`` — the runtime
    consumption of the "first-class" estimator (SURVEY.md §2.1), and it
    composes multiplicatively with an optional semantic ``weight_map``.
    """
    if not normalized:
        mean = jnp.asarray([0.485, 0.456, 0.406], rgb.dtype)
        std = jnp.asarray([0.229, 0.224, 0.225], rgb.dtype)
        rgb = (rgb - mean) / std
    out = model.apply(variables, rgb)
    xy = out.keypoints_px
    d = nearest_sample(depth, xy)
    valid = out.valid & (d > 0.05) & (d < 15.0)
    sem_w = out.confidence if use_confidence else jnp.ones_like(d)
    if weight_map is not None:
        sem_w = sem_w * nearest_sample(weight_map, xy)
    return FrameFeatures(
        xy=xy,
        desc=out.descriptors.astype(jnp.float32),
        depth=d,
        valid=valid,
        score=out.scores,
        sem_weight=sem_w.astype(jnp.float32),
    )


class TrackingResult(NamedTuple):
    poses_wc: jnp.ndarray  # (F, 4, 4) camera-in-world trajectory
    num_matches: jnp.ndarray  # (F,) matches to previous frame
    num_inliers: jnp.ndarray  # (F,) PnP inliers
    rmse: jnp.ndarray  # (F,) inlier reprojection rmse


def _pair_pose(
    key,
    feats_prev: FrameFeatures,
    feats_cur: FrameFeatures,
    cam: PinholeCamera,
    max_distance: float = 64.0,
    num_hypotheses: int = 64,
):
    """Relative pose T_cur<-prev from matched backprojected keypoints."""
    m = matching.match_hamming(
        feats_prev.desc,
        feats_cur.desc,
        feats_prev.valid,
        feats_cur.valid,
        max_distance=max_distance,
    )
    idx2 = m.idx2
    pts_prev = backproject(feats_prev.xy, feats_prev.depth, cam)  # (N, 3)
    xy_cur = feats_cur.xy[idx2]
    d_cur = feats_cur.depth[idx2]
    pts_cur = backproject(xy_cur, d_cur, cam)
    valid = m.valid & (d_cur > 0.05)
    # Semantic weight of a correspondence = product of both endpoints'
    # weights: a match is only as trustworthy as its most dynamic end.
    w = feats_prev.sem_weight * feats_cur.sem_weight[idx2]

    result = pnp.ransac_pose(
        key,
        pts_prev,
        pts_cur,
        xy_cur,
        cam,
        valid,
        weights=w,
        num_hypotheses=num_hypotheses,
    )
    return result, m.count()


def track_sequence(
    key: jax.Array,
    features: FrameFeatures,
    cam: PinholeCamera,
    min_inliers: int = 12,
    num_hypotheses: int = 64,
) -> TrackingResult:
    """Chain relative poses over a sequence of per-frame features.

    Scan carry: camera-in-world pose of the previous frame. When a frame
    fails (inliers < min_inliers) the constant-position model is used
    (identity relative pose) — the jnp.where analogue of the reference
    baselines' tracking-loss handling.
    """
    F = features.xy.shape[0]
    keys = jax.random.split(key, F)

    def step(carry, inp):
        T_prev_wc, prev = carry
        k, cur = inp
        result, n_matches = _pair_pose(
            k, prev, cur, cam, num_hypotheses=num_hypotheses
        )
        ok = result.num_inliers >= min_inliers
        T_rel = jnp.where(ok, result.pose, jnp.eye(4))  # cur <- prev
        # camera-in-world: T_wc_cur = T_wc_prev @ T_rel^{-1}
        T_cur_wc = T_prev_wc @ lie.pose_inverse(T_rel)
        out = (T_cur_wc, n_matches, result.num_inliers, result.rmse)
        return (T_cur_wc, cur), out

    first = jax.tree.map(lambda x: x[0], features)
    rest = jax.tree.map(lambda x: x[1:], features)
    init = (jnp.eye(4, dtype=jnp.float32), first)
    (_, _), (poses, n_matches, n_inliers, rmse) = jax.lax.scan(
        step, init, (keys[1:], rest)
    )

    eye = jnp.eye(4, dtype=jnp.float32)[None]
    zero = jnp.zeros((1,), dtype=n_matches.dtype)
    return TrackingResult(
        poses_wc=jnp.concatenate([eye, poses], axis=0),
        num_matches=jnp.concatenate([zero, n_matches]),
        num_inliers=jnp.concatenate([zero.astype(jnp.int32), n_inliers]),
        rmse=jnp.concatenate([jnp.zeros((1,)), rmse]),
    )
