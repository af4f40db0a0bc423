import numpy as np

from semantic_slam_master_tpu.core import camera as cam_mod
from semantic_slam_master_tpu.data import synthetic


def test_render_frame_shapes_and_determinism():
    seq = synthetic.make_sequence(num_frames=2, scale=0.25)
    f0 = seq.frame(0)
    assert f0["rgb"].shape == (seq.cam.height, seq.cam.width, 3)
    assert f0["depth"].shape == (seq.cam.height, seq.cam.width)
    assert f0["labels"].shape == (seq.cam.height, seq.cam.width)
    f0b = seq.frame(0)
    assert np.array_equal(f0["rgb"], f0b["rgb"])
    assert np.array_equal(f0["depth"], f0b["depth"])


def test_depth_is_positive_and_bounded():
    seq = synthetic.make_sequence(num_frames=1, scale=0.25)
    d = seq.frame(0)["depth"]
    assert (d > 0).mean() > 0.99  # closed room: almost every ray hits
    assert d.max() < 10.0


def test_depth_consistent_with_reprojection():
    """Backprojecting frame-0 pixels with rendered depth and reprojecting
    into frame 1 must land on pixels whose frame-1 depth agrees."""
    seq = synthetic.make_sequence(num_frames=10, scale=0.25)
    f0, f1 = seq.frame(0), seq.frame(5)
    cam = seq.cam
    H, W = cam.height, cam.width

    ys, xs = np.mgrid[10:H - 10:12, 10:W - 10:12]
    px = np.stack([xs.ravel(), ys.ravel()], axis=-1).astype(np.float64)
    depth0 = f0["depth"][ys.ravel(), xs.ravel()]

    # camera0 -> world -> camera1
    x_cam = (px[:, 0] - cam.cx) / cam.fx * depth0
    y_cam = (px[:, 1] - cam.cy) / cam.fy * depth0
    pts_cam0 = np.stack([x_cam, y_cam, depth0], axis=-1)
    T0, T1 = f0["pose_wc"], f1["pose_wc"]
    pts_w = pts_cam0 @ T0[:3, :3].T + T0[:3, 3]
    T1_inv = np.linalg.inv(T1)
    pts_cam1 = pts_w @ T1_inv[:3, :3].T + T1_inv[:3, 3]

    u1 = cam.fx * pts_cam1[:, 0] / pts_cam1[:, 2] + cam.cx
    v1 = cam.fy * pts_cam1[:, 1] / pts_cam1[:, 2] + cam.cy
    inb = (u1 >= 0) & (u1 < W - 1) & (v1 >= 0) & (v1 < H - 1) & (pts_cam1[:, 2] > 0)
    d1 = f1["depth"][np.round(v1[inb]).astype(int), np.round(u1[inb]).astype(int)]
    # Most points are on the same surfaces (occlusion causes a few outliers)
    rel_err = np.abs(d1 - pts_cam1[inb, 2]) / pts_cam1[inb, 2]
    assert np.median(rel_err) < 0.02


def test_labels_cover_multiple_classes():
    seq = synthetic.make_sequence(num_frames=1, scale=0.25)
    labels = seq.frame(0)["labels"]
    assert len(np.unique(labels)) >= 3


def test_texture_has_gradient_structure():
    seq = synthetic.make_sequence(num_frames=1, scale=0.5)
    rgb = seq.frame(0)["rgb"]
    gray = rgb.mean(axis=-1)
    gx = np.abs(np.diff(gray, axis=1)).mean()
    assert gx > 0.005  # enough texture for corners


def test_orbit_trajectory_is_smooth():
    ts, poses = synthetic.orbit_trajectory(50)
    steps = np.linalg.norm(np.diff(poses[:, :3, 3], axis=0), axis=1)
    assert steps.max() < 0.05  # < 5 cm/frame at 30 fps
    assert ts[1] - ts[0] > 0
