import jax
import jax.numpy as jnp
import numpy as np

from semantic_slam_master_tpu.core import lie
from semantic_slam_master_tpu.slam import bow, posegraph


def _random_desc(rng, n):
    return jnp.asarray(rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32))


def test_assign_words_exact_match(rng):
    vocab = bow.make_vocabulary(64)
    # descriptors equal to vocabulary entries map to themselves
    ids = bow.assign_words(vocab[:10], vocab)
    assert np.array_equal(np.asarray(ids), np.arange(10))


def test_signature_normalized(rng):
    vocab = bow.make_vocabulary(128)
    desc = _random_desc(rng, 50)
    valid = jnp.ones(50, bool)
    sig = bow.keyframe_signature(desc, valid, vocab)
    assert sig.shape == (128,)
    assert np.isclose(float(jnp.linalg.norm(sig)), 1.0, atol=1e-5)
    # invalid descriptors contribute nothing
    sig0 = bow.keyframe_signature(desc, jnp.zeros(50, bool), vocab)
    assert float(jnp.linalg.norm(sig0)) == 0.0


def test_same_place_scores_higher(rng):
    """Signatures of overlapping descriptor sets score higher than
    disjoint random ones."""
    vocab = bow.make_vocabulary(256)
    base = _random_desc(rng, 100)
    # same place: 80% shared descriptors
    revisit = jnp.concatenate([base[:80], _random_desc(rng, 20)])
    other = _random_desc(rng, 100)
    v = jnp.ones(100, bool)
    s_base = bow.keyframe_signature(base, v, vocab)
    s_revisit = bow.keyframe_signature(revisit, v, vocab)
    s_other = bow.keyframe_signature(other, v, vocab)
    same = float(s_base @ s_revisit)
    diff = float(s_base @ s_other)
    assert same > diff + 0.2, (same, diff)


def test_database_query_excludes_recent(rng):
    vocab = bow.make_vocabulary(128)
    db = bow.KeyframeDatabase.create(capacity=8, num_words=128)
    descs = [_random_desc(rng, 40) for _ in range(4)]
    v = jnp.ones(40, bool)
    for fid, d in zip([0, 10, 20, 30], descs):
        db = db.add(bow.keyframe_signature(d, v, vocab), fid)
    # query with frame 0's own signature from frame 35
    sig = bow.keyframe_signature(descs[0], v, vocab)
    fid, score = db.query(sig, current_frame_id=35, min_frame_gap=30)
    assert int(fid) == 0 and float(score) > 0.99
    # with a huge gap requirement nothing is eligible
    fid2, _ = db.query(sig, current_frame_id=35, min_frame_gap=100)
    assert int(fid2) == -1


def test_train_vocabulary_clusters():
    """k-medians vocabulary: cluster centers should attract their members."""
    rng = np.random.default_rng(5)  # local seed: k-medians init-sensitive
    proto = _random_desc(rng, 4)
    # members = protos with a few flipped bits
    members = []
    for p in np.asarray(proto):
        for _ in range(20):
            flip = rng.integers(0, 2**32, size=8, dtype=np.uint32)
            # flip ~6 bits: AND the flip mask down
            mask = flip & flip & flip & flip & np.uint32(0x01010101)
            members.append(p ^ mask)
    corpus = jnp.asarray(np.stack(members))
    vocab = bow.train_vocabulary(corpus, num_words=4, iters=5)
    ids = np.asarray(bow.assign_words(corpus, vocab))
    # members of the same proto overwhelmingly land in one cluster
    for c in range(4):
        grp = ids[c * 20 : (c + 1) * 20]
        _, counts = np.unique(grp, return_counts=True)
        assert counts.max() >= 18, grp


def test_posegraph_closes_drift(rng):
    """A drifting loop trajectory + one loop edge -> endpoint corrected."""
    K = 12
    # ground truth: square loop back to start
    gt = [np.eye(4)]
    step = np.asarray(lie.se3_exp(jnp.asarray([0.5, 0, 0, 0, np.pi / 6, 0])))
    for _ in range(K - 1):
        gt.append(gt[-1] @ step)
    gt = np.stack(gt)

    # odometry with bias -> drift
    noisy_step = np.asarray(
        lie.se3_exp(jnp.asarray([0.52, 0.005, 0, 0, np.pi / 6 + 0.02, 0]))
    )
    est = [np.eye(4)]
    for _ in range(K - 1):
        est.append(est[-1] @ noisy_step)
    est = np.stack(est)

    drift_before = np.linalg.norm(est[-1][:3, 3] - gt[-1][:3, 3])

    # loop edge: relative pose between node 0 and node K-1 measured exactly
    T_loop = np.linalg.inv(gt[0]) @ gt[-1]
    opt = posegraph.close_loops(
        jnp.asarray(est, jnp.float32),
        [(0, K - 1, jnp.asarray(T_loop, jnp.float32), 10.0)],
    )
    opt = np.asarray(opt)
    drift_after = np.linalg.norm(opt[-1][:3, 3] - gt[-1][:3, 3])
    assert drift_after < drift_before * 0.3, (drift_before, drift_after)
    # gauge: node 0 stays put
    assert np.allclose(opt[0], est[0], atol=1e-3)


def test_detect_loops_on_revisit(rng):
    vocab = bow.make_vocabulary(256)
    place_a = _random_desc(rng, 60)
    frames = []
    for f in range(6):
        if f in (0, 5):  # frame 5 revisits frame 0's place
            frames.append(jnp.concatenate([place_a[:50], _random_desc(rng, 10)]))
        else:
            frames.append(_random_desc(rng, 60))
    desc = jnp.stack(frames)
    valid = jnp.ones((6, 60), bool)
    loops = bow.detect_loops(
        desc, valid, np.arange(6), vocab, min_score=0.4, min_frame_gap=3
    )
    assert any(i == 5 and j == 0 for i, j, s in loops), loops
