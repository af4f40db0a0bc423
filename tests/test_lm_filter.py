"""Landmark birth filter (`system._refine_landmarks`).

Pins the semantics that make the filter safe for loop closure: it is the
exact online mean of the first `lm_refine_cap` sightings and then FREEZES
(drift-contaminated later sightings must not keep moving map geometry —
see SlamConfig.lm_refine_cap). Reference context: ORB-SLAM's map-point
refinement averages early observations of new points before culling.
"""

import jax.numpy as jnp
import numpy as np

from semantic_slam_master_tpu.slam import system


def _state(cfg, positions, counts):
    state = system.init_map(cfg)
    M = cfg.num_landmarks
    pos = np.zeros((M, 3), np.float32)
    obs = np.zeros((M,), np.float32)
    pos[: len(positions)] = positions
    obs[: len(counts)] = counts
    valid = np.zeros((M,), bool)
    valid[: len(positions)] = True
    return state._replace(
        positions=jnp.asarray(pos),
        lm_obs=jnp.asarray(obs),
        lm_valid=jnp.asarray(valid),
    )


def test_online_mean_of_first_sightings():
    """k sequential sightings + birth sample converge to their mean."""
    cfg = system.SlamConfig(num_landmarks=8, window_size=2, lm_refine_cap=16)
    rng = np.random.default_rng(0)
    truth = np.array([1.0, 2.0, 3.0], np.float32)
    samples = (truth + rng.normal(0, 0.02, (12, 3))).astype(np.float32)

    state = _state(cfg, samples[:1], [1.0])  # born from sample 0
    T_wc = jnp.eye(4)  # identity pose: camera frame == world frame
    for s in samples[1:]:
        state = system._refine_landmarks(
            state,
            T_wc,
            jnp.asarray(s)[None, :],
            jnp.asarray([0], jnp.int32),
            jnp.asarray([True]),
            cfg,
        )
    got = np.asarray(state.positions[0])
    np.testing.assert_allclose(got, samples.mean(0), atol=1e-5)
    assert float(state.lm_obs[0]) == len(samples)


def test_freezes_at_cap():
    """Once lm_obs >= cap the position must not move at all."""
    cfg = system.SlamConfig(num_landmarks=8, window_size=2, lm_refine_cap=4)
    pos = np.array([[1.0, 1.0, 1.0]], np.float32)
    state = _state(cfg, pos, [4.0])  # already at cap
    out = system._refine_landmarks(
        state,
        jnp.eye(4),
        jnp.asarray([[9.0, 9.0, 9.0]], jnp.float32),
        jnp.asarray([0], jnp.int32),
        jnp.asarray([True]),
        cfg,
    )
    np.testing.assert_array_equal(np.asarray(out.positions[0]), pos[0])


def test_masked_observations_do_not_touch_map():
    cfg = system.SlamConfig(num_landmarks=8, window_size=2, lm_refine_cap=16)
    pos = np.array([[1.0, 1.0, 1.0], [2.0, 2.0, 2.0]], np.float32)
    state = _state(cfg, pos, [1.0, 1.0])
    out = system._refine_landmarks(
        state,
        jnp.eye(4),
        jnp.asarray([[9.0, 9.0, 9.0], [0.0, 0.0, 0.0]], jnp.float32),
        jnp.asarray([0, 1], jnp.int32),
        jnp.asarray([False, False]),
        cfg,
    )
    np.testing.assert_array_equal(np.asarray(out.positions[:2]), pos)
    np.testing.assert_array_equal(
        np.asarray(out.lm_obs[:2]), np.array([1.0, 1.0], np.float32)
    )


def test_observation_in_camera_frame_is_transformed():
    """Sightings arrive in camera coordinates; the filter must blend in
    world coordinates through T_wc."""
    cfg = system.SlamConfig(num_landmarks=8, window_size=2, lm_refine_cap=16)
    # Camera translated to x=+2 in world: world->cam adds -2, cam->world +2.
    T_wc = np.eye(4, dtype=np.float32)
    T_wc[0, 3] = 2.0
    pt_world = np.array([[3.0, 0.0, 5.0]], np.float32)
    pt_cam = pt_world - np.array([2.0, 0.0, 0.0], np.float32)
    state = _state(cfg, pt_world, [1.0])
    out = system._refine_landmarks(
        state,
        jnp.asarray(T_wc),
        jnp.asarray(pt_cam),
        jnp.asarray([0], jnp.int32),
        jnp.asarray([True]),
        cfg,
    )
    # Observation equals the stored world position -> blend is a no-op.
    np.testing.assert_allclose(
        np.asarray(out.positions[0]), pt_world[0], atol=1e-6
    )
