import jax.numpy as jnp
import numpy as np

from semantic_slam_master_tpu.core import camera as cam_mod
from semantic_slam_master_tpu.core import lie
from semantic_slam_master_tpu.slam import ba

CAM = cam_mod.TUM_FR1


def _make_problem(rng, K=4, M=60, pose_noise=0.01, point_noise=0.02, obs_noise=0.2):
    """Ground-truth window + noisy initialization."""
    points_gt = np.stack(
        [rng.uniform(-2, 2, M), rng.uniform(-1.5, 1.5, M), rng.uniform(2.5, 6.0, M)],
        axis=-1,
    ).astype(np.float32)
    poses_gt = []
    for k in range(K):
        xi = np.array([0.08 * k, 0.01 * k, 0.02 * k, 0.0, 0.03 * k, 0.0], dtype=np.float32)
        poses_gt.append(np.asarray(lie.se3_exp(jnp.asarray(xi))))
    poses_gt = np.stack(poses_gt)

    obs = np.zeros((K, M, 2), dtype=np.float32)
    obs_depth = np.zeros((K, M), dtype=np.float32)
    valid = np.zeros((K, M), dtype=bool)
    for k in range(K):
        p_cam = points_gt @ poses_gt[k, :3, :3].T + poses_gt[k, :3, 3]
        uv = np.asarray(cam_mod.project(jnp.asarray(p_cam), CAM))
        inb = (
            (uv[:, 0] > 0) & (uv[:, 0] < CAM.width) & (uv[:, 1] > 0)
            & (uv[:, 1] < CAM.height) & (p_cam[:, 2] > 0.1)
        )
        obs[k] = uv + rng.normal(scale=obs_noise, size=uv.shape)
        obs_depth[k] = p_cam[:, 2] + rng.normal(scale=obs_noise * 0.005, size=M)
        valid[k] = inb

    # Noisy initial estimates (keyframe 0 fixed at GT: gauge).
    poses_init = poses_gt.copy()
    for k in range(1, K):
        xi = rng.normal(scale=pose_noise, size=6).astype(np.float32)
        poses_init[k] = np.asarray(lie.se3_exp(jnp.asarray(xi))) @ poses_gt[k]
    points_init = points_gt + rng.normal(scale=point_noise, size=points_gt.shape).astype(np.float32)

    problem = ba.BAProblem.create(
        poses=jnp.asarray(poses_init),
        points=jnp.asarray(points_init),
        observations=jnp.asarray(obs),
        valid=jnp.asarray(valid),
        obs_depth=jnp.asarray(obs_depth),
    )
    return problem, poses_gt, points_gt


def test_ba_reduces_cost(rng):
    problem, poses_gt, points_gt = _make_problem(rng)
    result = ba.bundle_adjust(problem, CAM, num_iters=8)
    assert float(result.final_cost) < float(result.initial_cost) * 0.1


def test_ba_recovers_poses(rng):
    problem, poses_gt, points_gt = _make_problem(rng, obs_noise=0.0)
    result = ba.bundle_adjust(problem, CAM, num_iters=10)
    poses = np.asarray(result.poses)
    for k in range(len(poses)):
        E = np.linalg.inv(poses[k]) @ poses_gt[k]
        assert np.linalg.norm(E[:3, 3]) < 2e-3, k
        ang = np.arccos(np.clip((np.trace(E[:3, :3]) - 1) / 2, -1, 1))
        assert ang < 2e-3, k


def test_ba_gauge_fixed(rng):
    """Keyframe 0 must not move (gauge prior)."""
    problem, poses_gt, _ = _make_problem(rng)
    result = ba.bundle_adjust(problem, CAM, num_iters=8)
    E = np.linalg.inv(np.asarray(result.poses)[0]) @ np.asarray(problem.poses)[0]
    assert np.linalg.norm(E[:3, 3]) < 1e-4
    assert np.allclose(E[:3, :3], np.eye(3), atol=1e-4)


def test_ba_confidence_downweights_outliers(rng):
    """Corrupt observations of some landmarks in one keyframe; with
    confidence=0 on them BA should match the clean solution."""
    problem, poses_gt, points_gt = _make_problem(rng, obs_noise=0.0)
    obs = np.asarray(problem.observations).copy()
    conf = np.asarray(problem.confidence).copy()
    bad = slice(0, 10)
    obs[2, bad] += 80.0  # gross corruption
    conf[2, bad] = 0.0  # ...but semantically down-weighted (e.g. dynamic)
    corrupted = problem._replace(
        observations=jnp.asarray(obs), confidence=jnp.asarray(conf)
    )
    result = ba.bundle_adjust(corrupted, CAM, num_iters=10)
    poses = np.asarray(result.poses)
    for k in range(len(poses)):
        E = np.linalg.inv(poses[k]) @ poses_gt[k]
        assert np.linalg.norm(E[:3, 3]) < 5e-3, k


def test_ba_handles_unobserved_points(rng):
    problem, _, _ = _make_problem(rng)
    valid = np.asarray(problem.valid).copy()
    valid[:, :5] = False  # points never observed
    p2 = problem._replace(valid=jnp.asarray(valid))
    result = ba.bundle_adjust(p2, CAM, num_iters=5)
    # unobserved points must not move
    assert np.allclose(
        np.asarray(result.points)[:5], np.asarray(problem.points)[:5], atol=1e-5
    )
    assert np.isfinite(float(result.final_cost))


def test_ba_jit(rng):
    import jax

    problem, _, _ = _make_problem(rng, K=3, M=40)
    f = jax.jit(lambda p: ba.bundle_adjust(p, CAM, num_iters=4))
    r1 = f(problem)
    assert np.isfinite(float(r1.final_cost))
