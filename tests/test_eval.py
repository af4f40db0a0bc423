import numpy as np
import jax.numpy as jnp

from semantic_slam_master_tpu.core import lie
from semantic_slam_master_tpu.data import trajectory_io
from semantic_slam_master_tpu.eval import ate_rpe


def _random_trajectory(rng, n=60):
    ts = np.arange(n) / 30.0
    poses = np.tile(np.eye(4), (n, 1, 1))
    pos = np.cumsum(rng.normal(scale=0.01, size=(n, 3)), axis=0)
    for i in range(n):
        poses[i, :3, :3] = np.asarray(
            lie.so3_exp(jnp.asarray(rng.normal(scale=0.02, size=3), dtype=jnp.float32))
        )
        poses[i, :3, 3] = pos[i]
    return ts, poses


def test_umeyama_recovers_rigid_transform(rng):
    src = rng.normal(size=(50, 3))
    R_true = np.asarray(lie.so3_exp(jnp.asarray([0.3, -0.2, 0.5])))
    t_true = np.array([1.0, -2.0, 0.5])
    dst = src @ R_true.T + t_true
    R, t, s = ate_rpe.umeyama_alignment(src, dst, with_scale=False)
    assert np.allclose(R, R_true, atol=1e-5)
    assert np.allclose(t, t_true, atol=1e-5)
    assert s == 1.0


def test_umeyama_with_scale(rng):
    src = rng.normal(size=(50, 3))
    dst = 2.5 * src
    R, t, s = ate_rpe.umeyama_alignment(src, dst, with_scale=True)
    assert np.isclose(s, 2.5, atol=1e-6)


def test_ate_zero_for_rigidly_displaced_trajectory(rng):
    ts, poses = _random_trajectory(rng)
    offset = np.eye(4)
    offset[:3, :3] = np.asarray(lie.so3_exp(jnp.asarray([0.1, 0.2, -0.1])))
    offset[:3, 3] = [3.0, 1.0, -2.0]
    est = np.einsum("ij,njk->nik", offset, poses)
    result = ate_rpe.compute_ate(poses, est)
    assert result["rmse"] < 1e-6  # alignment removes rigid offset exactly


def test_ate_known_error(rng):
    ts, poses = _random_trajectory(rng)
    est = poses.copy()
    # ATE is invariant to rigid offset; inject alternating +/- noise that no
    # rigid alignment can remove.
    est[::2, 0, 3] += 0.02
    est[1::2, 0, 3] -= 0.02
    result = ate_rpe.compute_ate(poses, est)
    assert 0.005 < result["rmse"] < 0.05


def test_rpe_perfect_is_zero(rng):
    ts, poses = _random_trajectory(rng)
    result = ate_rpe.compute_rpe(poses, poses, delta=10)
    assert result["translation"]["rmse"] < 1e-9
    assert result["rotation"]["rmse"] < 1e-5


def test_rpe_short_trajectory_returns_none(rng):
    ts, poses = _random_trajectory(rng, n=5)
    assert ate_rpe.compute_rpe(poses, poses, delta=10) is None


def test_rpe_nonoverlapping_pair_count(rng):
    ts, poses = _random_trajectory(rng, n=35)
    # pairs: (0,10), (10,20), (20,30) -> 3
    est = poses.copy()
    est[:, 0, 3] += np.linspace(0, 0.1, 35)
    r = ate_rpe.compute_rpe(poses, est, delta=10)
    assert r is not None


def test_evaluate_trajectory_schema(rng):
    ts, poses = _random_trajectory(rng)
    est = poses.copy()
    est[:, :3, 3] += rng.normal(scale=0.005, size=(len(ts), 3))
    result = ate_rpe.evaluate_trajectory(ts, poses, ts, est)
    assert result["status"] == "success"
    assert set(result["ate"].keys()) == {"rmse", "mean", "median", "std", "min", "max"}
    assert "rpe" in result and "translation" in result["rpe"]
    assert result["num_poses"] == len(ts)


def test_trajectory_io_roundtrip(tmp_path, rng):
    ts, poses = _random_trajectory(rng, n=20)
    path = tmp_path / "traj.txt"
    trajectory_io.write_tum_trajectory(path, ts, poses)
    ts2, poses2 = trajectory_io.read_tum_trajectory(path)
    assert np.allclose(ts, ts2, atol=1e-6)
    assert np.allclose(poses, poses2, atol=1e-4)


def test_sync_trajectories_drops_unmatched(rng):
    ts, poses = _random_trajectory(rng, n=30)
    # estimated trajectory missing every 3rd frame, slight time offset
    keep = np.arange(30) % 3 != 0
    t_sync, gt_s, est_s = ate_rpe.sync_trajectories(
        ts, poses, ts[keep] + 0.002, poses[keep]
    )
    assert len(gt_s) == keep.sum()
