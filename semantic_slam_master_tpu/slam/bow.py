"""Bag-of-binary-words place recognition on the MXU.

TPU-native replacement for the DBoW2/DBoW3 loop-closure backends the
reference's baselines clone and build (SURVEY.md §2.2 "DBoW2" row:
"descriptor-quantization BoW as on-device matmul scoring"). Everything
is dense linear algebra:

- the vocabulary is K 256-bit binary words; assigning N descriptors is
  one (N, 256) x (256, K) ±1 matmul + argmin (exact Hamming, same trick
  as `ops.matching`);
- a keyframe's signature is the L2-normalized tf histogram of its
  words (a segment-sum scatter);
- querying the keyframe database is one (K_vocab,) x (M, K_vocab)
  matvec — cosine scores against every stored keyframe at once.

The default vocabulary is a deterministic random one (seeded sign
patterns). Random binary codebooks are a standard LSH baseline for
Hamming space; `train_vocabulary` refines it into k-medians words from
real descriptors when a corpus is available.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.orb import NUM_BITS, to_signs


def make_vocabulary(num_words: int = 1024, seed: int = 42) -> jnp.ndarray:
    """Deterministic random binary vocabulary, packed (K, 8) uint32."""
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.integers(0, 2**32, size=(num_words, 8), dtype=np.uint32)
    )


def assign_words(descriptors: jnp.ndarray, vocab: jnp.ndarray) -> jnp.ndarray:
    """Nearest visual word per descriptor. (N, 8) -> (N,) int32."""
    s_desc = to_signs(descriptors)  # (N, 256) ±1
    s_vocab = to_signs(vocab)  # (K, 256)
    dot = jnp.einsum("nd,kd->nk", s_desc, s_vocab, preferred_element_type=jnp.float32)
    return jnp.argmax(dot, axis=-1).astype(jnp.int32)  # max dot == min Hamming


def tf_signature(
    word_ids: jnp.ndarray, valid: jnp.ndarray, num_words: int
) -> jnp.ndarray:
    """L2-normalized term-frequency histogram of a keyframe's words."""
    onehot_sum = jnp.zeros(num_words, jnp.float32).at[word_ids].add(
        valid.astype(jnp.float32)
    )
    return onehot_sum / jnp.maximum(jnp.linalg.norm(onehot_sum), 1e-8)


def train_vocabulary(
    descriptors: np.ndarray, num_words: int = 1024, iters: int = 8, seed: int = 0
) -> jnp.ndarray:
    """k-medians (Hamming) vocabulary from a descriptor corpus (N, 8).

    Init: greedy farthest-point seeding on a subsample (random init tends
    to drop multiple seeds into one cluster and k-medians' hard
    assignment cannot split them). Update: centroids are the bitwise
    majority of their members — the binary analogue of the k-means
    update DBoW builds its tree with.
    """
    from ..ops.orb import pack_bits, unpack_bits

    descriptors = jnp.asarray(descriptors)
    n = descriptors.shape[0]
    rng = np.random.default_rng(seed)

    # --- farthest-point init on a subsample (numpy popcount) ---
    sub_idx = rng.choice(n, size=min(n, 8 * num_words), replace=False)
    sub = np.asarray(descriptors)[sub_idx]
    sub_bits = np.unpackbits(sub.view(np.uint8), axis=-1)  # (M, 256)
    chosen = [int(rng.integers(len(sub)))]
    min_d = np.full(len(sub), np.inf)
    for _ in range(min(num_words, len(sub)) - 1):
        d = (sub_bits != sub_bits[chosen[-1]][None]).sum(axis=1)
        min_d = np.minimum(min_d, d)
        chosen.append(int(np.argmax(min_d)))
    centroids = jnp.asarray(sub[np.array(chosen)])
    if centroids.shape[0] < num_words:  # tiny corpus: repeat
        reps = -(-num_words // centroids.shape[0])
        centroids = jnp.tile(centroids, (reps, 1))[:num_words]
    bits = unpack_bits(descriptors).astype(jnp.float32)  # (N, 256)
    for _ in range(iters):
        ids = assign_words(descriptors, centroids)
        counts = jnp.zeros(num_words, jnp.float32).at[ids].add(1.0)
        sums = jnp.zeros((num_words, NUM_BITS), jnp.float32).at[ids].add(bits)
        majority = (sums * 2.0 > counts[:, None]).astype(jnp.uint32)
        new_centroids = pack_bits(majority[None])[0]
        # keep old centroid for empty clusters
        centroids = jnp.where(counts[:, None] > 0, new_centroids, centroids)
    return centroids


class KeyframeDatabase(NamedTuple):
    """Fixed-shape ring database of keyframe BoW signatures."""

    signatures: jnp.ndarray  # (M, K_vocab)
    frame_ids: jnp.ndarray  # (M,) int32 — SLAM frame index of each entry
    valid: jnp.ndarray  # (M,)
    ptr: jnp.ndarray  # scalar int32

    @staticmethod
    def create(capacity: int, num_words: int) -> "KeyframeDatabase":
        return KeyframeDatabase(
            signatures=jnp.zeros((capacity, num_words), jnp.float32),
            frame_ids=jnp.full((capacity,), -1, jnp.int32),
            valid=jnp.zeros((capacity,), bool),
            ptr=jnp.asarray(0, jnp.int32),
        )

    def add(self, signature: jnp.ndarray, frame_id) -> "KeyframeDatabase":
        i = self.ptr
        return self._replace(
            signatures=self.signatures.at[i].set(signature),
            frame_ids=self.frame_ids.at[i].set(frame_id),
            valid=self.valid.at[i].set(True),
            ptr=(self.ptr + 1) % self.valid.shape[0],
        )

    def query(
        self,
        signature: jnp.ndarray,
        current_frame_id,
        min_frame_gap: int = 30,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Best-matching stored keyframe outside the temporal exclusion
        window. Returns (best_frame_id, score); frame_id -1 if none."""
        scores = self.signatures @ signature  # (M,)
        eligible = self.valid & (
            (current_frame_id - self.frame_ids) >= min_frame_gap
        )
        scores = jnp.where(eligible, scores, -1.0)
        best = jnp.argmax(scores)
        best_score = scores[best]
        return (
            jnp.where(best_score > 0, self.frame_ids[best], -1),
            best_score,
        )


def keyframe_signature(
    descriptors: jnp.ndarray, valid: jnp.ndarray, vocab: jnp.ndarray
) -> jnp.ndarray:
    """Descriptors (N, 8) + validity -> BoW signature (K_vocab,)."""
    ids = assign_words(descriptors, vocab)
    return tf_signature(ids, valid, vocab.shape[0])


def detect_loops(
    per_frame_desc: jnp.ndarray,
    per_frame_valid: jnp.ndarray,
    keyframe_idx: np.ndarray,
    vocab: jnp.ndarray,
    min_score: float = 0.35,
    min_frame_gap: int = 30,
):
    """Offline loop detection over a finished sequence's keyframes.

    per_frame_desc (F, N, 8) / valid (F, N); keyframe_idx: frame indices
    that are keyframes. Returns [(frame_i, frame_j, score)] candidate
    loop closures (j < i - gap).
    """
    sigs = jax.vmap(keyframe_signature, in_axes=(0, 0, None))(
        jnp.asarray(per_frame_desc)[np.asarray(keyframe_idx)],
        jnp.asarray(per_frame_valid)[np.asarray(keyframe_idx)],
        vocab,
    )
    s = np.asarray(sigs @ sigs.T)  # (Kf, Kf)
    kf = np.asarray(keyframe_idx)
    # Vectorized thresholding (was an O(Kf^2) Python double loop).
    gap_ok = (kf[:, None] - kf[None, :]) >= min_frame_gap  # a - b, b older
    hit = np.tril(gap_ok & (s >= min_score), -1)
    aa, bb = np.nonzero(hit)
    return [
        (int(kf[a]), int(kf[b]), float(s[a, b])) for a, b in zip(aa, bb)
    ]


class BowIndex:
    """Incremental BoW keyframe index for ONLINE loop closure.

    Fixes the round-2 finding that `run_slam_online` re-trained the
    k-medians vocabulary from scratch and re-scored the FULL keyframe
    history at every chunk boundary (O(F^2)-ish host work). The index:

    - buffers keyframe descriptors until ``min_train_keyframes`` have
      arrived, then trains the vocabulary ONCE and freezes it (DBoW
      semantics: a fixed vocabulary, trained on early data);
    - computes each keyframe's signature exactly once;
    - scores only NEW keyframes against the stored history per query.

    Host-side object (lives across chunk boundaries, like the loop-
    closing thread's database in ORB-SLAM3).
    """

    def __init__(
        self,
        num_words: int = 1024,
        min_train_keyframes: int = 12,
        vocab: jnp.ndarray | None = None,
    ):
        self.num_words = num_words
        self.min_train_keyframes = min_train_keyframes
        self.vocab = vocab
        self._buffer: list = []  # [(desc np, valid np, frame_id)] pre-vocab
        self.signatures: list = []  # np (K_vocab,) per indexed keyframe
        self.frame_ids: list = []  # frame id per indexed keyframe

    def add_keyframe(self, desc, valid, frame_id: int) -> None:
        self._buffer.append(
            (np.asarray(desc), np.asarray(valid), int(frame_id))
        )
        self._drain()

    def _drain(self) -> None:
        if self.vocab is None:
            if (
                len(self._buffer) + len(self.frame_ids)
                < self.min_train_keyframes
            ):
                return
            corpus = np.concatenate([d[v] for d, v, _ in self._buffer])
            if len(corpus) < 64:
                return
            num_words = int(min(self.num_words, max(64, len(corpus) // 4)))
            self.vocab = train_vocabulary(
                jnp.asarray(corpus), num_words=num_words
            )
        for desc, valid, fid in self._buffer:
            sig = keyframe_signature(
                jnp.asarray(desc), jnp.asarray(valid), self.vocab
            )
            self.signatures.append(np.asarray(sig))
            self.frame_ids.append(fid)
        self._buffer.clear()

    def force_train(self) -> bool:
        """Train the vocabulary NOW from whatever has been buffered,
        ignoring ``min_train_keyframes`` (end-of-stream path for
        sequences too short to reach the normal training corpus — the
        12-keyframe threshold otherwise leaves short runs with no
        vocabulary and therefore no loop closure at all). Returns True
        if a vocabulary exists afterwards."""
        if self.vocab is None and self._buffer:
            corpus = np.concatenate([d[v] for d, v, _ in self._buffer])
            if len(corpus) >= 64:
                num_words = int(
                    min(self.num_words, max(64, len(corpus) // 4))
                )
                self.vocab = train_vocabulary(
                    jnp.asarray(corpus), num_words=num_words
                )
        self._drain()
        return self.vocab is not None

    def new_candidates(
        self,
        num_new: int,
        min_score: float = 0.35,
        min_frame_gap: int = 30,
        per_keyframe: int | None = 3,
    ):
        """Score the last ``num_new`` indexed keyframes against all OLDER
        ones. Returns [(frame_new, frame_old, score)], best-first.

        ``per_keyframe`` keeps only each new keyframe's top-k partners:
        one aliased new keyframe otherwise floods the candidate list with
        near-identical pairs and starves the others' true loops out of
        the downstream verification budget."""
        K = len(self.frame_ids)
        if K < 2 or num_new <= 0:
            return []
        num_new = min(num_new, K)
        sigs = np.stack(self.signatures)
        fids = np.asarray(self.frame_ids)
        new = sigs[K - num_new :]
        s = new @ sigs.T  # (num_new, K)
        out = []
        for r in range(num_new):
            a = K - num_new + r
            ok = (fids[a] - fids[:a]) >= min_frame_gap
            mine = [
                (int(fids[a]), int(fids[b]), float(s[r, b]))
                for b in np.nonzero(ok & (s[r, :a] >= min_score))[0]
            ]
            mine.sort(key=lambda t: -t[2])
            out.extend(mine[:per_keyframe] if per_keyframe else mine)
        out.sort(key=lambda t: -t[2])
        return out
