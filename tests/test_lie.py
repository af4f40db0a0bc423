import jax
import jax.numpy as jnp
import numpy as np

from semantic_slam_master_tpu.core import lie


def random_rotations(rng, n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return np.asarray(lie.quat_to_matrix(jnp.asarray(q, dtype=jnp.float32)))


def test_hat_vee_roundtrip(rng):
    v = jnp.asarray(rng.normal(size=(5, 3)), dtype=jnp.float32)
    assert np.allclose(lie.vee(lie.hat(v)), v)


def test_so3_exp_log_roundtrip(rng):
    phi = jnp.asarray(rng.normal(size=(32, 3)), dtype=jnp.float32)
    phi = phi / jnp.linalg.norm(phi, axis=-1, keepdims=True) * jnp.asarray(
        rng.uniform(0.0, 3.0, size=(32, 1)), dtype=jnp.float32
    )
    R = lie.so3_exp(phi)
    # Orthonormality
    eye = jnp.eye(3)
    assert np.allclose(R @ jnp.swapaxes(R, -1, -2), jnp.broadcast_to(eye, R.shape), atol=1e-5)
    phi2 = lie.so3_log(R)
    assert np.allclose(phi, phi2, atol=1e-4)


def test_so3_small_angle():
    phi = jnp.asarray([[1e-9, -1e-9, 1e-9], [0.0, 0.0, 0.0]], dtype=jnp.float32)
    R = lie.so3_exp(phi)
    assert np.all(np.isfinite(np.asarray(R)))
    assert np.allclose(lie.so3_log(R), phi, atol=1e-6)
    # Gradient must be finite at zero
    g = jax.grad(lambda p: jnp.sum(lie.so3_exp(p)))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_so3_log_gradient_at_identity():
    """arccos-based log has an infinite gradient at the identity; the
    atan2 form must stay finite (pose-graph GN depends on this)."""
    g = jax.jacfwd(lambda p: lie.so3_log(lie.so3_exp(p)))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.allclose(g, np.eye(3), atol=1e-4)


def test_se3_exp_log_roundtrip(rng):
    xi = jnp.asarray(rng.normal(size=(16, 6)) * 0.8, dtype=jnp.float32)
    T = lie.se3_exp(xi)
    assert np.allclose(lie.se3_log(T), xi, atol=1e-4)
    assert np.allclose(T[..., 3, :], np.tile([0, 0, 0, 1], (16, 1)))


def test_pose_inverse(rng):
    xi = jnp.asarray(rng.normal(size=(8, 6)), dtype=jnp.float32)
    T = lie.se3_exp(xi)
    eye = jnp.broadcast_to(jnp.eye(4), T.shape)
    assert np.allclose(T @ lie.pose_inverse(T), eye, atol=1e-5)


def test_quat_matrix_roundtrip(rng):
    q = rng.normal(size=(64, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q *= np.where(q[:, 3:4] < 0, -1.0, 1.0)  # canonical sign
    R = lie.quat_to_matrix(jnp.asarray(q, dtype=jnp.float32))
    q2 = lie.matrix_to_quat(R)
    assert np.allclose(q, np.asarray(q2), atol=1e-5)


def test_quat_to_matrix_matches_reference_formula(rng):
    """Cross-check against the reference's scalar formula
    (tum_dataset.py:258-272) evaluated in numpy."""
    q = rng.normal(size=(4,))
    q /= np.linalg.norm(q)
    qx, qy, qz, qw = q
    R_ref = np.array(
        [
            [1 - 2 * (qy**2 + qz**2), 2 * (qx * qy - qz * qw), 2 * (qx * qz + qy * qw)],
            [2 * (qx * qy + qz * qw), 1 - 2 * (qx**2 + qz**2), 2 * (qy * qz - qx * qw)],
            [2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw), 1 - 2 * (qx**2 + qy**2)],
        ]
    )
    R = lie.quat_to_matrix(jnp.asarray(q, dtype=jnp.float32))
    assert np.allclose(R, R_ref, atol=1e-6)


def test_transform_points(rng):
    xi = jnp.asarray(rng.normal(size=(6,)), dtype=jnp.float32)
    T = lie.se3_exp(xi)
    pts = jnp.asarray(rng.normal(size=(10, 3)), dtype=jnp.float32)
    expected = (np.asarray(T[:3, :3]) @ np.asarray(pts).T).T + np.asarray(T[:3, 3])
    assert np.allclose(lie.transform_points(T, pts), expected, atol=1e-5)


def test_relative_pose_convention(rng):
    T1 = lie.se3_exp(jnp.asarray(rng.normal(size=(6,)), dtype=jnp.float32))
    T2 = lie.se3_exp(jnp.asarray(rng.normal(size=(6,)), dtype=jnp.float32))
    T_rel = lie.relative_pose(T1, T2)
    assert np.allclose(T_rel @ T1, T2, atol=1e-5)


def test_rotation_angle():
    phi = jnp.array([0.0, 0.7, 0.0])
    R = lie.so3_exp(phi)
    assert np.allclose(lie.rotation_angle(R), 0.7, atol=1e-5)
