"""Pinhole camera models and TUM RGB-D intrinsics presets.

Carries the fr1/fr3 calibrations recorded in the reference
(`configs/datasets/tum_rgbd.yaml:20-36`) plus the fr2 calibration required
by the north-star fr2/desk benchmark (SURVEY.md §6D; values are the public
TUM RGB-D benchmark calibration for the Freiburg-2 Kinect).

All projection math is pure jnp, fixed-shape and batch-friendly so it can
live inside jitted tracking/BA solves.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class PinholeCamera(NamedTuple):
    """Pinhole intrinsics. Fields are python floats / static ints so a camera
    can be closed over by jitted functions without becoming a traced value."""

    fx: float
    fy: float
    cx: float
    cy: float
    width: int = 640
    height: int = 480
    depth_scale: float = 5000.0  # TUM 16-bit depth -> meters divisor

    @property
    def K(self) -> jnp.ndarray:
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=jnp.float32,
        )

    @property
    def K_inv(self) -> jnp.ndarray:
        return jnp.array(
            [
                [1.0 / self.fx, 0.0, -self.cx / self.fx],
                [0.0, 1.0 / self.fy, -self.cy / self.fy],
                [0.0, 0.0, 1.0],
            ],
            dtype=jnp.float32,
        )

    def scaled(self, sx: float, sy: float) -> "PinholeCamera":
        """Intrinsics after resizing the image by (sx, sy)."""
        return self._replace(
            fx=self.fx * sx,
            fy=self.fy * sy,
            cx=self.cx * sx,
            cy=self.cy * sy,
            width=int(round(self.width * sx)),
            height=int(round(self.height * sy)),
        )


# TUM RGB-D benchmark calibrations.
# fr1/fr3: reference `configs/datasets/tum_rgbd.yaml:20-36`.
# fr2: public TUM benchmark calibration (needed for fr2/desk, SURVEY.md §6D).
TUM_FR1 = PinholeCamera(fx=517.3, fy=516.5, cx=318.6, cy=255.3)
TUM_FR2 = PinholeCamera(fx=520.9, fy=521.0, cx=325.1, cy=249.7)
TUM_FR3 = PinholeCamera(fx=535.4, fy=539.2, cx=320.1, cy=247.6)

CAMERAS = {"freiburg1": TUM_FR1, "freiburg2": TUM_FR2, "freiburg3": TUM_FR3}


def camera_for_sequence(sequence: str) -> PinholeCamera:
    """Pick intrinsics from a TUM sequence name (e.g.
    ``rgbd_dataset_freiburg1_desk``), mirroring the calib-file selection in
    the reference's `baselines/orb_slam3/scripts/run_baseline.sh:55-59`."""
    for key, cam in CAMERAS.items():
        if key in sequence:
            return cam
    raise ValueError(f"cannot infer camera from sequence name: {sequence}")


def project(points_cam: jnp.ndarray, cam: PinholeCamera) -> jnp.ndarray:
    """Project camera-frame 3D points (..., 3) to pixels (..., 2).

    Z is clamped away from zero so the op stays finite inside optimization
    loops; callers should mask points with non-positive depth.
    """
    z = points_cam[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = cam.fx * points_cam[..., 0] / z_safe + cam.cx
    v = cam.fy * points_cam[..., 1] / z_safe + cam.cy
    return jnp.stack([u, v], axis=-1)


def backproject(pixels: jnp.ndarray, depth: jnp.ndarray, cam: PinholeCamera) -> jnp.ndarray:
    """Lift pixels (..., 2) with metric depth (...,) to camera-frame 3D points."""
    x = (pixels[..., 0] - cam.cx) / cam.fx * depth
    y = (pixels[..., 1] - cam.cy) / cam.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def in_bounds(pixels: jnp.ndarray, cam: PinholeCamera, margin: float = 0.0) -> jnp.ndarray:
    """Boolean mask of pixels inside the image frame."""
    u, v = pixels[..., 0], pixels[..., 1]
    return (
        (u >= margin)
        & (u <= cam.width - 1 - margin)
        & (v >= margin)
        & (v <= cam.height - 1 - margin)
    )


def rotation_homography(K: jnp.ndarray, R: jnp.ndarray) -> jnp.ndarray:
    """Rotation-only homography ``H = K R K^{-1}`` used by the reference's
    repeatability ground truth (`semantic-slam/test/test_repeatability.py:178-192`)."""
    return K @ R @ jnp.linalg.inv(K)


def apply_homography(H: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Warp (..., N, 2) points by a 3x3 homography."""
    ones = jnp.ones_like(pts[..., :1])
    homo = jnp.concatenate([pts, ones], axis=-1)
    warped = homo @ jnp.swapaxes(H, -1, -2)
    return warped[..., :2] / jnp.maximum(jnp.abs(warped[..., 2:3]), 1e-8) * jnp.sign(
        warped[..., 2:3]
    )
