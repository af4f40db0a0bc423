import jax.numpy as jnp
import numpy as np

from semantic_slam_master_tpu.ops import matching


def _rand_unit(rng, n, d=16):
    v = rng.normal(size=(n, d)).astype(np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_cosine_mutual_nn_identity(rng):
    desc = jnp.asarray(_rand_unit(rng, 40))[None]
    m = matching.match_cosine(desc, desc, ratio=None)
    assert np.array_equal(np.asarray(m.idx2)[0], np.arange(40))
    assert np.asarray(m.valid).all()


def test_cosine_matches_numpy_reference(rng):
    """Vectorized mutual-NN + ratio equals the reference's numpy algorithm
    (test_descriptor_quality.py:97-142)."""
    d1 = _rand_unit(rng, 50)
    d2 = _rand_unit(rng, 60)
    ratio = 0.9

    sim = d1 @ d2.T
    nn12 = sim.argmax(1)
    nn21 = sim.argmax(0)
    mutual = nn21[nn12] == np.arange(50)
    s_sorted = np.sort(sim, axis=1)[:, ::-1]
    ratio_ok = s_sorted[:, 1] / (s_sorted[:, 0] + 1e-8) < ratio
    ref_valid = mutual & ratio_ok

    m = matching.match_cosine(jnp.asarray(d1)[None], jnp.asarray(d2)[None], ratio=ratio)
    assert np.array_equal(np.asarray(m.idx2)[0], nn12)
    assert np.array_equal(np.asarray(m.valid)[0], ref_valid)


def test_validity_masking(rng):
    d1 = _rand_unit(rng, 10)
    d2 = np.concatenate([d1, _rand_unit(rng, 5)], axis=0)
    valid2 = np.ones(15, dtype=bool)
    valid2[:10] = False  # exclude the perfect matches
    m = matching.match_cosine(
        jnp.asarray(d1)[None],
        jnp.asarray(d2)[None],
        valid2=jnp.asarray(valid2)[None],
        ratio=None,
    )
    assert np.asarray(m.idx2).min() >= 10  # never matched an invalid column


def test_hamming_threshold(rng):
    a = rng.integers(0, 2**32, size=(1, 5, 8), dtype=np.uint32)
    m = matching.match_hamming(jnp.asarray(a), jnp.asarray(a), max_distance=10.0)
    assert np.asarray(m.valid).all()
    assert np.allclose(np.asarray(m.score), 0.0)  # distance 0 to itself

    b = ~a  # all bits flipped -> distance 256
    m2 = matching.match_hamming(jnp.asarray(a), jnp.asarray(b), max_distance=64.0)
    assert not np.asarray(m2.valid).any()


def test_matches_to_pairs(rng):
    d1 = _rand_unit(rng, 12)
    m = matching.match_cosine(jnp.asarray(d1)[None], jnp.asarray(d1)[None], ratio=None)
    # invalidate some rows
    valid = np.asarray(m.valid)[0].copy()
    valid[3] = False
    valid[7] = False
    m = m._replace(valid=jnp.asarray(valid)[None])
    pairs, pvalid = matching.matches_to_pairs(m, max_pairs=8)
    assert pairs.shape == (1, 8, 2)
    p = np.asarray(pairs)[0][np.asarray(pvalid)[0]]
    assert 3 not in p[:, 0] and 7 not in p[:, 0]
    assert (p[:, 0] == p[:, 1]).all()
