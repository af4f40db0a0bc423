import jax.numpy as jnp
import numpy as np

from semantic_slam_master_tpu.core import fixed


def test_masked_topk_enough_candidates():
    scores = jnp.array([0.1, 0.9, 0.5, 0.7, 0.3])
    mask = jnp.ones(5, dtype=bool)
    vals, idx, valid = fixed.masked_topk(scores, mask, 3)
    assert list(np.asarray(idx)) == [1, 3, 2]
    assert np.all(np.asarray(valid))


def test_masked_topk_padding_repeats_best():
    scores = jnp.array([0.1, 0.9, 0.5, 0.7, 0.3])
    mask = jnp.array([False, True, False, True, False])
    vals, idx, valid = fixed.masked_topk(scores, mask, 4)
    assert list(np.asarray(idx)) == [1, 3, 1, 1]
    assert list(np.asarray(valid)) == [True, True, False, False]
    assert np.allclose(np.asarray(vals), [0.9, 0.7, 0.9, 0.9])


def test_quantile_matches_torch_semantics():
    import torch

    x = np.random.default_rng(1).normal(size=(784,)).astype(np.float32)
    ours = fixed.quantile(jnp.asarray(x), 0.5)
    theirs = torch.quantile(torch.from_numpy(x), 0.5).item()
    assert np.isclose(float(ours), theirs, atol=1e-5)


def test_masked_mean_var():
    x = jnp.array([1.0, 2.0, 3.0, 100.0])
    mask = jnp.array([True, True, True, False])
    assert np.isclose(float(fixed.masked_mean(x, mask)), 2.0)
    assert np.isclose(float(fixed.masked_var(x, mask)), 2.0 / 3.0)


def test_finite_or():
    x = jnp.array([1.0, jnp.nan, jnp.inf, -jnp.inf])
    y = fixed.finite_or(x, 0.5)
    assert np.allclose(np.asarray(y), [1.0, 0.5, 0.5, 0.5])


def test_pad_axis_to():
    x = jnp.ones((3, 2))
    y = fixed.pad_axis_to(x, 5, axis=0, value=-1)
    assert y.shape == (5, 2)
    assert np.all(np.asarray(y[3:]) == -1)


def test_round_up():
    assert fixed.round_up(500, 128) == 512
    assert fixed.round_up(128, 128) == 128
