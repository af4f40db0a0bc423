"""Brute-force descriptor matching on the MXU.

TPU-native replacement for the reference's three matching paths:

- host numpy mutual-NN + Lowe ratio over cosine similarity
  (`test/test_descriptor_quality.py:97-142`),
- per-image torch loops in training (`train.py:410-449`),
- FAISS/FLANN approximate search in the pySLAM baseline
  (`baselines/pyslam/scripts/setup.sh:48`).

Exact brute force *is* the TPU-idiomatic answer (SURVEY.md §2.2): a
(N, D) x (D, M) matmul saturates the MXU at these sizes, and Hamming
distance over 256-bit ORB descriptors becomes a ±1 matmul:
``hamming = (256 - <sa, sb>) / 2`` with sa, sb in {-1, +1}^256. Products
are exact in bf16 and accumulate exactly in f32 (sums <= 256), so the
result is bit-identical to popcount.

All outputs are fixed-shape: per-row match index + boolean validity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .orb import NUM_BITS, to_signs


class Matches(NamedTuple):
    """Fixed-shape match set between two keypoint lists.

    idx2:   (..., N) int32 — for each frame-1 keypoint, its frame-2 match
    valid:  (..., N) bool  — match passed mutual/ratio/threshold tests
    score:  (..., N) float32 — similarity (cosine) or negative distance
            (Hamming) of the best match
    """

    idx2: jnp.ndarray
    valid: jnp.ndarray
    score: jnp.ndarray

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid, axis=-1)


def hamming_distance_matrix(desc1: jnp.ndarray, desc2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise Hamming distances of packed ORB descriptors via the MXU.

    desc1: (..., N, 8) uint32; desc2: (..., M, 8) uint32 ->
    (..., N, M) float32 in [0, 256].
    """
    s1 = to_signs(desc1)  # (..., N, 256) bf16
    s2 = to_signs(desc2)
    dot = jnp.einsum(
        "...nd,...md->...nm", s1, s2, preferred_element_type=jnp.float32
    )
    return (NUM_BITS - dot) * 0.5


def cosine_similarity_matrix(desc1: jnp.ndarray, desc2: jnp.ndarray) -> jnp.ndarray:
    """(..., N, D) x (..., M, D) -> (..., N, M) similarity (descriptors are
    L2-normalized by the refiner, `descriptor_refiner.py:86`)."""
    return jnp.einsum(
        "...nd,...md->...nm", desc1, desc2, preferred_element_type=jnp.float32
    )


def _mutual_and_ratio(
    sim: jnp.ndarray,
    valid1: jnp.ndarray | None,
    valid2: jnp.ndarray | None,
    ratio: float | None,
    min_score: float | None,
) -> Matches:
    """Shared mutual-NN/ratio logic over a *similarity* matrix (higher =
    better). Invalid rows/columns are excluded via -inf masking."""
    neg = jnp.asarray(-3.4e38, dtype=sim.dtype)
    if valid2 is not None:
        sim = jnp.where(valid2[..., None, :], sim, neg)

    best2 = jnp.argmax(sim, axis=-1)  # (..., N)
    best_val = jnp.max(sim, axis=-1)
    # Mutual check: argmax over rows for each column.
    best1_of_col = jnp.argmax(sim, axis=-2)  # (..., M)
    n = sim.shape[-2]
    row_ids = jnp.arange(n)
    mutual = jnp.take_along_axis(best1_of_col, best2, axis=-1) == row_ids

    ok = mutual
    if valid1 is not None:
        ok = ok & valid1
    if min_score is not None:
        ok = ok & (best_val > min_score)
    if ratio is not None:
        # Second-best similarity per row (mask out the best column).
        masked = jnp.where(
            jnp.arange(sim.shape[-1]) == best2[..., None], neg, sim
        )
        second = jnp.max(masked, axis=-1)
        # Lowe ratio in similarity form — the reference's
        # `second/best < ratio` (`test_descriptor_quality.py:127-129`).
        ok = ok & (second < ratio * best_val)
    return Matches(idx2=best2.astype(jnp.int32), valid=ok, score=best_val)


def match_cosine(
    desc1: jnp.ndarray,
    desc2: jnp.ndarray,
    valid1: jnp.ndarray | None = None,
    valid2: jnp.ndarray | None = None,
    ratio: float | None = 0.9,
    min_similarity: float | None = None,
) -> Matches:
    """Mutual-NN + ratio matching of float descriptors (..., N/M, D)."""
    sim = cosine_similarity_matrix(desc1, desc2)
    return _mutual_and_ratio(sim, valid1, valid2, ratio, min_similarity)


def match_hamming(
    desc1: jnp.ndarray,
    desc2: jnp.ndarray,
    valid1: jnp.ndarray | None = None,
    valid2: jnp.ndarray | None = None,
    max_distance: float | None = 64.0,
    ratio: float | None = None,
) -> Matches:
    """Mutual-NN matching of packed ORB descriptors with a distance gate
    (ORB-SLAM's TH_LOW=50-of-256 style threshold, default 64) and an
    optional distance-ratio test (``best < ratio * second``)."""
    dist = hamming_distance_matrix(desc1, desc2)
    sim = -dist
    min_score = -max_distance if max_distance is not None else None
    m = _mutual_and_ratio(sim, valid1, valid2, None, min_score)
    if ratio is not None:
        neg = jnp.asarray(-3.4e38, dtype=sim.dtype)
        if valid2 is not None:
            sim = jnp.where(valid2[..., None, :], sim, neg)
        masked = jnp.where(jnp.arange(sim.shape[-1]) == m.idx2[..., None], neg, sim)
        second_dist = -jnp.max(masked, axis=-1)
        best_dist = -m.score
        m = m._replace(valid=m.valid & (best_dist < ratio * second_dist))
    return m


def matches_to_pairs(matches: Matches, max_pairs: int):
    """Compact a Matches row-map into (K, 2) index pairs + validity by
    taking the first ``max_pairs`` valid rows (fixed shape; order is by
    keypoint index). Useful for loss/PnP consumers that want pair lists
    like the reference's `_find_matches` output (`train.py:410-449`)."""
    n = matches.idx2.shape[-1]
    order = jnp.argsort(~matches.valid, axis=-1, stable=True)  # valid first
    take = order[..., :max_pairs]
    idx1 = take
    idx2 = jnp.take_along_axis(matches.idx2, take, axis=-1)
    valid = jnp.take_along_axis(matches.valid, take, axis=-1)
    return jnp.stack([idx1, idx2], axis=-1).astype(jnp.int32), valid
