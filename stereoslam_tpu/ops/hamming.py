"""Batched Hamming descriptor matching (XOR + popcount).

Replaces the reference's ``cv::BFMatcher(NORM_HAMMING)`` brute-force match
(reference src/loopclosing.cpp:172) with one (Ma x Mb) popcount matrix on
the VPU, plus the reference's distance gating ``d <= max(2*min_d, 30)``
(loopclosing.cpp:183) and feature-level (class-id) deduplication
(loopclosing.cpp:184-193) done with masked reductions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MatchResult(NamedTuple):
    # Per query-descriptor (row of a):
    best_idx: jnp.ndarray    # (Ma,) int32 — best match in b
    best_dist: jnp.ndarray   # (Ma,) int32
    accepted: jnp.ndarray    # (Ma,) bool — passed distance gate + dedup


def hamming_matrix(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """(Ma, 8) x (Mb, 8) packed-uint32 descriptors -> (Ma, Mb) int32 distances."""
    x = desc_a[:, None, :] ^ desc_b[None, :, :]
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def match_descriptors(
    desc_a: jnp.ndarray,
    valid_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    valid_b: jnp.ndarray,
    class_a: jnp.ndarray,
    class_b: jnp.ndarray,
    max_features: int,
    floor: int = 30,
) -> MatchResult:
    """Brute-force match a -> b with the reference's gating + class dedup.

    ``class_*`` map pyramid-expanded keypoints to their source feature slot
    (the reference's ``kp.class_id``, loopclosing.cpp:97); after distance
    gating, only the best match per (class_a) is kept so each source feature
    contributes one candidate match, deduplicating pyramid levels.

    Returns matches in *class space*: best_idx[i] is a descriptor index in b;
    use class_b[best_idx] for the feature-level pairing.
    """
    BIG = jnp.int32(1 << 20)
    d = hamming_matrix(desc_a, desc_b)
    d = jnp.where(valid_b[None, :], d, BIG)
    best_idx = jnp.argmin(d, axis=1).astype(jnp.int32)
    best_dist = jnp.take_along_axis(d, best_idx[:, None], axis=1)[:, 0]
    best_dist = jnp.where(valid_a, best_dist, BIG)

    min_dist = jnp.min(best_dist)
    gate = jnp.maximum(2 * min_dist, floor)
    ok = valid_a & (best_dist <= gate)

    # Dedup per source feature class: keep the smallest-distance expanded
    # keypoint of each class_a.
    cls = jnp.where(ok, class_a, max_features)  # invalid -> overflow bucket
    per_class_best = jax.ops.segment_min(
        jnp.where(ok, best_dist, BIG), cls, num_segments=max_features + 1
    )
    is_class_best = ok & (best_dist <= per_class_best[jnp.minimum(cls, max_features)])
    # Break ties (same distance, same class at several levels): keep lowest idx.
    Ma = desc_a.shape[0]
    idx = jnp.arange(Ma, dtype=jnp.int32)
    first_at_best = jax.ops.segment_min(
        jnp.where(is_class_best, idx, Ma), cls, num_segments=max_features + 1
    )
    accepted = is_class_best & (idx == first_at_best[jnp.minimum(cls, max_features)])
    return MatchResult(best_idx=best_idx, best_dist=best_dist, accepted=accepted)
