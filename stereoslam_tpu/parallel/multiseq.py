"""Multi-sequence data-parallel ingestion.

New capability over the reference (single-sequence, single-process): a batch
of independent stereo sequences is tracked simultaneously, one sequence per
data-axis mesh slot.  The whole frontend step — LK pyramids, flow, pose-only
LM — is vmapped over the batch and pjit-sharded over the mesh's data axis,
so frames/s scales with chips (BASELINE.md "high-rate mode").
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stereoslam_tpu.config import SlamConfig
from stereoslam_tpu.core.frontend import TrackOutput, track_step
from stereoslam_tpu.core.state import FrontendState, MapState
from stereoslam_tpu.ops.camera import Intrinsics
from stereoslam_tpu.ops.image import build_lk_pyramid


def batched_track_step(
    fs: FrontendState,       # leading batch dim B on every leaf
    map_state: MapState,     # leading batch dim B
    prev_left: jnp.ndarray,  # (B, H, W)
    cur_left: jnp.ndarray,   # (B, H, W)
    intr: Intrinsics,
    cfg: SlamConfig,
) -> TrackOutput:
    """One tracking step for B sequences at once (vmapped frontend)."""

    def one(fs_i, map_i, prev_i, cur_i):
        pyr_prev = build_lk_pyramid(prev_i, cfg.tracking.lk_levels)
        pyr_cur = build_lk_pyramid(cur_i, cfg.tracking.lk_levels)
        return track_step(fs_i, map_i, pyr_prev, pyr_cur, intr, cfg)

    return jax.vmap(one)(fs, map_state, prev_left, cur_left)


def make_data_parallel_step(
    mesh: Mesh, intr: Intrinsics, cfg: SlamConfig, data_axis: str = "data"
):
    """jit the batched step with batch leaves sharded over the data axis."""
    batch_sharding = NamedSharding(mesh, P(data_axis))

    def shard_batch(tree):
        return jax.tree.map(lambda x: jax.device_put(x, batch_sharding), tree)

    step = jax.jit(partial(batched_track_step, intr=intr, cfg=cfg))
    return step, shard_batch
