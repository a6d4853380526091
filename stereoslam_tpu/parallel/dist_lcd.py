"""Sharded loop-closure descriptor database search.

The reference scans its KF database serially on one CPU core
(reference src/loopclosing.cpp:131-143: one dot product per stored KF).
Here the database is a row-sharded (K, D) matrix over the mesh's model
axis: each device scores its shard with one matmul slice, then the
arg-max/suspect-count reduce over ICI (``psum``/``pmax``) — the scan stays
O(K/devices) per chip no matter how large the run grows.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


class ShardedDetectResult(NamedTuple):
    best_id: jnp.ndarray     # () int32 — global row index of best match
    best_score: jnp.ndarray  # () float32
    n_suspect: jnp.ndarray   # () int32 — scores above the low threshold


def sharded_descriptor_search(
    db: jnp.ndarray,
    db_valid: jnp.ndarray,
    query: jnp.ndarray,
    eligible_max_id: jnp.ndarray,
    low_threshold: float,
    mesh: Mesh,
    model_axis: str = "model",
) -> ShardedDetectResult:
    """Search a row-sharded database for ``query``.

    Args:
      db: (K, D) descriptor matrix, sharded (model, None).
      db_valid: (K,) bool, sharded (model,).
      query: (D,) replicated.
      eligible_max_id: () int32 — ids >= this are too recent (the reference's
        20-id gap, loopclosing.cpp:133).

    Returns replicated scalars.
    """
    K = db.shape[0]
    n_shards = mesh.shape[model_axis]
    shard_rows = K // n_shards

    def local(db_s, valid_s, q, max_id):
        # db_s: (K/n, D) local shard.
        idx = jax.lax.axis_index(model_axis)
        base = idx * shard_rows
        ids = base + jnp.arange(shard_rows, dtype=jnp.int32)
        scores = db_s @ q  # local matmul slice
        ok = valid_s & (ids < max_id)
        scores = jnp.where(ok, scores, -1.0)
        best_local = jnp.argmax(scores)
        best_score_local = scores[best_local]
        best_id_local = ids[best_local]
        n_sus_local = jnp.sum((scores > low_threshold).astype(jnp.int32))

        # Combine across shards: max-score wins; count sums.
        all_scores = jax.lax.all_gather(best_score_local, model_axis)
        all_ids = jax.lax.all_gather(best_id_local, model_axis)
        winner = jnp.argmax(all_scores)
        n_sus = jax.lax.psum(n_sus_local, model_axis)
        return all_ids[winner], all_scores[winner], n_sus

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(model_axis, None), P(model_axis), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    best_id, best_score, n_sus = fn(db, db_valid, query, eligible_max_id)
    return ShardedDetectResult(best_id=best_id, best_score=best_score, n_suspect=n_sus)
