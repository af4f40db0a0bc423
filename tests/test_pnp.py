import jax
import jax.numpy as jnp
import numpy as np

from semantic_slam_master_tpu.core import camera as cam_mod
from semantic_slam_master_tpu.core import lie
from semantic_slam_master_tpu.slam import pnp

CAM = cam_mod.TUM_FR1


def _scene(rng, n=100, noise_px=0.0, outlier_frac=0.0, seed_pose=(0.05, -0.03, 0.02, 0.1, -0.05, 0.08)):
    """Random 3D points + a ground-truth relative pose + observations."""
    pts = np.stack(
        [
            rng.uniform(-2, 2, n),
            rng.uniform(-1.5, 1.5, n),
            rng.uniform(1.5, 5.0, n),
        ],
        axis=-1,
    ).astype(np.float32)
    T_gt = np.asarray(lie.se3_exp(jnp.asarray(seed_pose, dtype=jnp.float32)))
    pts_dst = pts @ T_gt[:3, :3].T + T_gt[:3, 3]
    obs = np.asarray(cam_mod.project(jnp.asarray(pts_dst), CAM))
    if noise_px > 0:
        obs = obs + rng.normal(scale=noise_px, size=obs.shape).astype(np.float32)
    n_out = int(outlier_frac * n)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        obs[idx] += rng.uniform(30, 120, size=(n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    return jnp.asarray(pts), jnp.asarray(pts_dst), jnp.asarray(obs), T_gt


def _pose_err(T_est, T_gt):
    E = np.linalg.inv(np.asarray(T_est)) @ T_gt
    t_err = np.linalg.norm(E[:3, 3])
    r_err = np.arccos(np.clip((np.trace(E[:3, :3]) - 1) / 2, -1, 1))
    return t_err, r_err


def test_kabsch_exact():
    rng = np.random.default_rng(7)  # fixed: shared rng makes f32 SVD flaky
    pts, pts_dst, _, T_gt = _scene(rng, n=10)
    T = pnp.kabsch(pts, pts_dst)
    t_err, r_err = _pose_err(T, T_gt)
    # f32 SVD precision; hypotheses are GN-polished downstream anyway
    assert t_err < 1e-4 and r_err < 2e-3


def test_kabsch_weighted_ignores_outliers():
    rng = np.random.default_rng(11)
    pts, pts_dst, _, T_gt = _scene(rng, n=20)
    pts_dst = pts_dst.at[0].add(jnp.asarray([5.0, 5.0, 5.0]))
    w = jnp.ones(20).at[0].set(0.0)
    T = pnp.kabsch(pts, pts_dst, w)
    t_err, r_err = _pose_err(T, T_gt)
    assert t_err < 1e-4 and r_err < 1e-4


def test_refine_pose_converges_from_perturbed_init(rng):
    pts, _, obs, T_gt = _scene(rng, n=80, noise_px=0.0)
    T_init = jnp.asarray(
        np.asarray(lie.se3_exp(jnp.asarray([0.05, -0.04, 0.03, 0.03, 0.02, -0.04])))
        @ T_gt
    )
    T = pnp.refine_pose(T_init, pts, obs, CAM, num_iters=10)
    t_err, r_err = _pose_err(T, T_gt)
    assert t_err < 1e-3, t_err
    assert r_err < 1e-3, r_err


def test_refine_pose_jacobian_matches_autodiff(rng):
    """Analytic projection Jacobian == jax.jacobian of the residual."""
    pts, _, obs, T_gt = _scene(rng, n=5)
    T0 = jnp.asarray(T_gt)

    def res(xi):
        T = lie.se3_exp(xi) @ T0
        r, _ = pnp.reprojection_residuals(T, pts, obs, CAM)
        return r.reshape(-1)

    J_auto = jax.jacobian(res)(jnp.zeros(6))
    p_cam = lie.transform_points(T0, pts)
    _, J_pose = pnp._projection_jacobians(p_cam, CAM)
    assert np.allclose(J_auto, np.asarray(J_pose).reshape(-1, 6), atol=2e-2, rtol=1e-3)


def test_ransac_rejects_outliers(rng):
    pts, pts_dst, obs, T_gt = _scene(rng, n=150, noise_px=0.3, outlier_frac=0.3)
    valid = jnp.ones(150, dtype=bool)
    result = pnp.ransac_pose(
        jax.random.PRNGKey(0), pts, pts_dst, obs, CAM, valid, num_hypotheses=64
    )
    t_err, r_err = _pose_err(result.pose, T_gt)
    assert int(result.num_inliers) > 80
    assert t_err < 0.01, t_err
    assert r_err < 0.01, r_err
    assert float(result.rmse) < 1.5


def test_ransac_with_few_valid_points(rng):
    pts, pts_dst, obs, T_gt = _scene(rng, n=50)
    valid = jnp.zeros(50, dtype=bool).at[:5].set(True)
    result = pnp.ransac_pose(
        jax.random.PRNGKey(1), pts, pts_dst, obs, CAM, valid, num_hypotheses=32
    )
    assert int(result.num_inliers) <= 5
    t_err, _ = _pose_err(result.pose, T_gt)
    assert t_err < 0.01  # 5 clean points are enough


def test_huber_weights():
    r = jnp.array([0.5, 3.0, 30.0])
    w = pnp.huber_weights(r, 3.0)
    assert np.allclose(np.asarray(w), [1.0, 1.0, 0.1])


def test_ransac_jit_compiles(rng):
    pts, pts_dst, obs, T_gt = _scene(rng, n=64)
    valid = jnp.ones(64, dtype=bool)
    f = jax.jit(
        lambda k: pnp.ransac_pose(k, pts, pts_dst, obs, CAM, valid, num_hypotheses=16)
    )
    r1 = f(jax.random.PRNGKey(0))
    r2 = f(jax.random.PRNGKey(0))
    assert np.allclose(np.asarray(r1.pose), np.asarray(r2.pose))


def test_kabsch_horn_matches_svd_procrustes(rng):
    """Horn quaternion Kabsch (power + Rayleigh iteration) vs the
    classic SVD Procrustes solution, over random weighted minimal and
    non-minimal sets: rotations agree to < 0.05 deg (f32 floor),
    translations to < 1e-3."""
    from semantic_slam_master_tpu.core import lie

    worst_ang, worst_t = 0.0, 0.0
    for _ in range(100):
        n = int(rng.integers(3, 30))
        src = rng.normal(0, 1, (n, 3)).astype(np.float32)
        xi = rng.normal(0, 0.5, 6).astype(np.float32)
        T = np.asarray(lie.se3_exp(jnp.asarray(xi)))
        dst = (
            src @ T[:3, :3].T + T[:3, 3]
            + rng.normal(0, 0.001, (n, 3)).astype(np.float32)
        )
        w = rng.uniform(0.1, 1.0, n).astype(np.float32)
        Th = np.asarray(pnp.kabsch(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w)))
        ws = w / w.sum()
        mu_s = (src * ws[:, None]).sum(0)
        mu_d = (dst * ws[:, None]).sum(0)
        cov = ((dst - mu_d) * ws[:, None]).T @ (src - mu_s)
        U, _, Vt = np.linalg.svd(cov.astype(np.float64))
        R = U @ np.diag([1, 1, np.linalg.det(U @ Vt)]) @ Vt
        t = mu_d - R @ mu_s
        cosang = (np.trace(Th[:3, :3].T @ R) - 1) / 2
        worst_ang = max(
            worst_ang, np.degrees(np.arccos(np.clip(cosang, -1, 1)))
        )
        worst_t = max(worst_t, np.linalg.norm(Th[:3, 3] - t))
    assert worst_ang < 0.05, worst_ang
    assert worst_t < 1e-3, worst_t
