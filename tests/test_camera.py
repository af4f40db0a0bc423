import jax.numpy as jnp
import numpy as np

from semantic_slam_master_tpu.core import camera, lie


def test_intrinsics_presets():
    assert camera.TUM_FR1.fx == 517.3 and camera.TUM_FR1.cy == 255.3
    assert camera.TUM_FR3.fx == 535.4 and camera.TUM_FR3.cx == 320.1
    assert camera.TUM_FR2.fx == 520.9
    assert camera.TUM_FR1.depth_scale == 5000.0


def test_camera_for_sequence():
    assert camera.camera_for_sequence("rgbd_dataset_freiburg1_desk") is camera.TUM_FR1
    assert camera.camera_for_sequence("rgbd_dataset_freiburg2_desk") is camera.TUM_FR2
    assert (
        camera.camera_for_sequence("rgbd_dataset_freiburg3_walking_xyz")
        is camera.TUM_FR3
    )


def test_project_backproject_roundtrip(rng):
    cam = camera.TUM_FR1
    depth = jnp.asarray(rng.uniform(0.5, 5.0, size=(100,)), dtype=jnp.float32)
    px = jnp.asarray(
        rng.uniform([0, 0], [cam.width - 1, cam.height - 1], size=(100, 2)),
        dtype=jnp.float32,
    )
    pts = camera.backproject(px, depth, cam)
    px2 = camera.project(pts, cam)
    assert np.allclose(px, px2, atol=1e-3)


def test_K_inverse():
    cam = camera.TUM_FR2
    assert np.allclose(cam.K @ cam.K_inv, np.eye(3), atol=1e-4)


def test_rotation_homography_identity():
    cam = camera.TUM_FR1
    H = camera.rotation_homography(cam.K, jnp.eye(3))
    assert np.allclose(H, np.eye(3), atol=1e-3)  # f32 inv of K with fx~517


def test_homography_warp_matches_projection(rng):
    """A rotation-only camera motion must warp pixels of far points exactly
    like reprojection does (the reference's GT-match construction,
    test_repeatability.py:178-192)."""
    cam = camera.TUM_FR1
    R = lie.so3_exp(jnp.array([0.01, -0.02, 0.005]))
    H = camera.rotation_homography(cam.K, R)

    px = jnp.asarray(rng.uniform([100, 100], [500, 380], size=(50, 2)), dtype=jnp.float32)
    depth = jnp.full((50,), 4.0)
    pts = camera.backproject(px, depth, cam)
    pts_rot = pts @ R.T  # rotation-only motion
    px_proj = camera.project(pts_rot, cam)
    px_warp = camera.apply_homography(H, px)
    assert np.allclose(px_proj, px_warp, atol=1e-2)


def test_in_bounds():
    cam = camera.TUM_FR1
    px = jnp.array([[0.0, 0.0], [-1.0, 5.0], [639.0, 479.0], [640.0, 100.0]])
    mask = camera.in_bounds(px, cam)
    assert list(np.asarray(mask)) == [True, False, True, False]


def test_scaled():
    cam = camera.TUM_FR1.scaled(0.5, 0.5)
    assert cam.width == 320 and cam.height == 240
    assert np.isclose(cam.fx, 517.3 * 0.5)
