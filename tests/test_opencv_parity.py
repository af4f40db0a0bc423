"""OpenCV cross-validation harness (SURVEY.md §7.2 M1).

The ORB test pattern is deliberately NOT OpenCV's learned
`bit_pattern_31_` table (ops/orb.py — copying it would defeat the
no-copy rule), so descriptors are not bit-exact with cv2. What CAN be
pinned against OpenCV, and is here:

- FAST corners: same detector definition (segment test, arc 9) -> our
  keypoints should land on cv2's keypoints.
- PnP: pose recovered by our vmapped RANSAC+GN must agree with
  `cv2.solvePnPRansac` + `cv2.solvePnP` refinement on the same
  correspondences (the g2o-pose-half contract, SURVEY.md §2.2).
- ORB matching quality: on a synthetic pair with ground-truth geometry,
  our descriptors' GT-consistent match rate must be in the same band as
  cv2.ORB's on identical frames — the measured form of the documented
  non-bit-exactness waiver (README).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")

from semantic_slam_master_tpu.core import lie
from semantic_slam_master_tpu.core.camera import TUM_FR2, backproject
from semantic_slam_master_tpu.data import synthetic
from semantic_slam_master_tpu.ops import fast, image, matching, orb
from semantic_slam_master_tpu.slam import pnp


def _gray_pair(num=2, scale=0.5, spacing=2, total=20):
    """Frames i*spacing out of a TOTAL-frame arc — the arc spans the whole
    sequence, so `total` (not num) sets the inter-frame motion scale."""
    seq = synthetic.make_sequence(num_frames=total, scale=scale)
    frames = [seq.frame(i * spacing) for i in range(num)]
    grays = [
        np.asarray(
            0.299 * f["rgb"][..., 0]
            + 0.587 * f["rgb"][..., 1]
            + 0.114 * f["rgb"][..., 2]
        ).astype(np.float32)
        for f in frames
    ]
    return seq, frames, grays


def test_fast_corners_land_on_opencv_corners():
    _, _, grays = _gray_pair(num=1)
    g = grays[0]
    K = 200
    kp = fast.detect(jnp.asarray(g)[None], K, threshold=0.06, nms_radius=3)
    ours = np.asarray(kp.xy[0])[np.asarray(kp.valid[0])]
    assert len(ours) >= 100

    # cv2 with NMS off at a slightly lower threshold = the unpruned
    # superset of segment-test corners; every corner we report must be a
    # cv2 corner too (NMS picks different peaks on plateaus, so comparing
    # against cv2's *pruned* set under-counts agreement).
    det = cv2.FastFeatureDetector_create(threshold=12, nonmaxSuppression=False)
    cv_kps = det.detect((g * 255).astype(np.uint8), None)
    assert len(cv_kps) > 0
    cv_xy = np.array([k.pt for k in cv_kps], dtype=np.float32)

    d = np.linalg.norm(ours[:, None, :] - cv_xy[None, :, :], axis=-1).min(axis=1)
    agreement = float((d <= 2.0).mean())
    assert agreement >= 0.95, f"FAST corner agreement {agreement:.2f}"


def test_ransac_pose_matches_opencv_solvepnp(rng):
    cam = TUM_FR2
    N = 120
    pts_world = np.stack(
        [
            rng.uniform(-1.5, 1.5, N),
            rng.uniform(-1.0, 1.0, N),
            rng.uniform(1.5, 4.0, N),
        ],
        axis=-1,
    ).astype(np.float64)
    # Ground-truth destination pose: modest rotation + translation.
    axis = np.array([0.2, -0.5, 0.1])
    T = np.asarray(lie.se3_exp(jnp.asarray(np.r_[0.05, -0.03, 0.02, axis * 0.15])))
    pts_cam = pts_world @ T[:3, :3].T + T[:3, 3]
    uv = np.stack(
        [
            cam.fx * pts_cam[:, 0] / pts_cam[:, 2] + cam.cx,
            cam.fy * pts_cam[:, 1] / pts_cam[:, 2] + cam.cy,
        ],
        axis=-1,
    )
    uv_noisy = uv + rng.normal(0, 0.3, uv.shape)
    # 15% gross outliers
    out_idx = rng.choice(N, N * 15 // 100, replace=False)
    uv_noisy[out_idx] += rng.uniform(30, 80, (len(out_idx), 2))

    Kmat = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]])
    ok, rvec, tvec, _ = cv2.solvePnPRansac(
        pts_world.reshape(-1, 1, 3),
        uv_noisy.reshape(-1, 1, 2),
        Kmat,
        None,
        reprojectionError=3.0,
        flags=cv2.SOLVEPNP_ITERATIVE,
    )
    assert ok
    R_cv, _ = cv2.Rodrigues(rvec)

    # Ours consumes RGB-D style inputs: destination 3D from (noisy) depth.
    depth = pts_cam[:, 2] + rng.normal(0, 0.01, N)
    pts_dst = np.asarray(
        backproject(jnp.asarray(uv_noisy, jnp.float32), jnp.asarray(depth, jnp.float32), cam)
    )
    res = pnp.ransac_pose(
        jax.random.PRNGKey(0),
        jnp.asarray(pts_world, jnp.float32),
        jnp.asarray(pts_dst, jnp.float32),
        jnp.asarray(uv_noisy, jnp.float32),
        cam,
        jnp.ones((N,), bool),
    )
    T_ours = np.asarray(res.pose)

    # Compare both estimates to ground truth AND to each other.
    def rot_err_deg(Ra, Rb):
        c = (np.trace(Ra.T @ Rb) - 1) / 2
        return np.degrees(np.arccos(np.clip(c, -1, 1)))

    assert rot_err_deg(T_ours[:3, :3], T[:3, :3]) < 0.5
    assert np.linalg.norm(T_ours[:3, 3] - T[:3, 3]) < 0.02
    assert rot_err_deg(T_ours[:3, :3], R_cv) < 0.5
    assert np.linalg.norm(T_ours[:3, 3] - tvec.ravel()) < 0.03


@pytest.mark.slow
def test_orb_match_quality_band_vs_opencv():
    """GT-consistent match rate of our ORB vs cv2.ORB on the same pair.

    The waiver's measured form: our pattern is different, so bits differ,
    but the *matching utility* must be comparable (>= 0.8x cv2's rate)."""
    seq, frames, grays = _gray_pair(num=2, spacing=2)
    cam = seq.cam

    def gt_ok(xy1, xy2, tol=4.0):
        """Match endpoints consistent with GT depth + relative pose."""
        f1, f2 = frames
        d1 = np.asarray(f1["depth"])
        h, w = d1.shape
        x = np.clip(np.round(xy1[:, 0]).astype(int), 0, w - 1)
        y = np.clip(np.round(xy1[:, 1]).astype(int), 0, h - 1)
        z = d1[y, x]
        pts1 = np.asarray(
            backproject(jnp.asarray(xy1, jnp.float32), jnp.asarray(z, jnp.float32), cam)
        )
        T12 = np.asarray(f2["pose_cw"] @ f1["pose_wc"]) if "pose_cw" in f2 else (
            np.linalg.inv(np.asarray(f2["pose_wc"])) @ np.asarray(f1["pose_wc"])
        )
        p2 = pts1 @ T12[:3, :3].T + T12[:3, 3]
        uv = np.stack(
            [cam.fx * p2[:, 0] / p2[:, 2] + cam.cx, cam.fy * p2[:, 1] / p2[:, 2] + cam.cy],
            axis=-1,
        )
        good = z > 0.05
        return good & (np.linalg.norm(uv - xy2, axis=-1) <= tol)

    # --- ours ---
    g = jnp.asarray(np.stack(grays))
    kp = fast.detect(g, 300, threshold=0.05, nms_radius=3)
    blurred = image.gaussian_blur(g, sigma=2.0, radius=3)
    desc = orb.describe(blurred, kp.xy, prefiltered=True)
    m = matching.match_hamming(desc[0], desc[1], kp.valid[0], kp.valid[1], max_distance=64.0)
    sel = np.asarray(m.valid)
    xy1 = np.asarray(kp.xy[0])[sel]
    xy2 = np.asarray(kp.xy[1])[np.asarray(m.idx2)[sel]]
    ours_ok = gt_ok(xy1, xy2)
    ours_rate = float(ours_ok.mean()) if len(ours_ok) else 0.0

    # --- cv2 ---
    det = cv2.ORB_create(nfeatures=300)
    u8 = [(gi * 255).astype(np.uint8) for gi in grays]
    k1, d1 = det.detectAndCompute(u8[0], None)
    k2, d2 = det.detectAndCompute(u8[1], None)
    bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=True)
    cv_matches = [mm for mm in bf.match(d1, d2) if mm.distance <= 64]
    cxy1 = np.array([k1[mm.queryIdx].pt for mm in cv_matches], np.float32)
    cxy2 = np.array([k2[mm.trainIdx].pt for mm in cv_matches], np.float32)
    cv_ok = gt_ok(cxy1, cxy2)
    cv_rate = float(cv_ok.mean()) if len(cv_ok) else 0.0

    assert len(ours_ok) >= 50 and len(cv_ok) >= 20
    assert ours_rate >= 0.6
    assert ours_rate >= 0.8 * cv_rate, (
        f"ours {ours_rate:.2f} vs cv2 {cv_rate:.2f}"
    )
