"""Multi-sequence data-parallel ingestion.

New capability over the reference (single-sequence, single-process): a batch
of independent stereo sequences is tracked simultaneously, one sequence per
data-axis mesh slot.  The whole frontend step — LK pyramids, flow, pose-only
LM — is vmapped over the batch and pjit-sharded over the mesh's data axis,
so frames/s scales with chips (BASELINE.md "high-rate mode").
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
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


class MultiSeqVO:
    """Batched stereo VO over B independent sequences, one per data-mesh slot.

    The BASELINE.md "high-rate mode": frames/s scales with chips because the
    whole frontend is one batched program.  Keyframe creation is the only
    data-dependent branch; it is handled by pulling a B-bit mask per frame
    and, when any sequence needs a KF, running the batched keyframe program
    for ALL sequences with per-sequence enable masking (masked sequences
    keep their state bit-identical).
    """

    def __init__(self, cfg: SlamConfig, batch: int, mesh: Optional[Mesh] = None):
        from stereoslam_tpu.core.frontend import (
            make_keyframe_step,
            stereo_init_step,
        )
        from stereoslam_tpu.core.state import init_frontend_state, init_map_state
        from stereoslam_tpu.ops.image import build_lk_pyramid

        self.cfg = cfg
        self.batch = batch
        cam = cfg.camera
        self.intr = Intrinsics.create(cam.fx, cam.fy, cam.cx, cam.cy)
        intr_r = Intrinsics.create(cam.fx_right, cam.fy_right, cam.cx_right, cam.cy_right)
        lk_levels = cfg.tracking.lk_levels

        def bcast(tree):
            return jax.tree.map(lambda x: jnp.broadcast_to(x[None], (batch,) + x.shape), tree)

        self.fs = bcast(init_frontend_state(cfg))
        self.maps = bcast(init_map_state(cfg))
        self.alive = np.ones(batch, bool)
        self._prev_left = None

        if mesh is not None:
            sh = NamedSharding(mesh, P("data"))
            self.fs = jax.tree.map(lambda x: jax.device_put(x, sh), self.fs)
            self.maps = jax.tree.map(lambda x: jax.device_put(x, sh), self.maps)

        def init_one(left, right, fs_i, map_i, ts):
            pl_ = build_lk_pyramid(left, lk_levels)
            pr_ = build_lk_pyramid(right, lk_levels)
            return stereo_init_step(
                left, pl_, pr_, fs_i, map_i, self.intr, intr_r, cam.baseline, ts, cfg
            )

        def track_one(fs_i, map_i, prev_l, cur_l):
            p0 = build_lk_pyramid(prev_l, lk_levels)
            p1 = build_lk_pyramid(cur_l, lk_levels)
            return track_step(fs_i, map_i, p0, p1, self.intr, cfg)

        def kf_one(enable, left, right, fs_i, map_i, ts):
            pl_ = build_lk_pyramid(left, lk_levels)
            pr_ = build_lk_pyramid(right, lk_levels)
            fs2, m2, _ = make_keyframe_step(
                left, pl_, pr_, fs_i, map_i, self.intr, intr_r, cam.baseline, ts, cfg
            )
            # Per-sequence enable: a scalar bool inside vmap broadcasts over
            # any leaf shape, keeping masked sequences bit-identical.
            pick = lambda new, old: jax.tree.map(
                lambda n, o: jnp.where(enable, n, o), new, old
            )
            return pick(fs2, fs_i), pick(m2, map_i)

        self._jit_init = jax.jit(jax.vmap(init_one))
        self._jit_track = jax.jit(jax.vmap(track_one))
        self._jit_kf = jax.jit(jax.vmap(kf_one))

    def initialize(self, left: np.ndarray, right: np.ndarray, ts: np.ndarray) -> np.ndarray:
        """Stereo-init every sequence on its first frame. Returns per-sequence
        landmark counts."""
        self.fs, self.maps, _, n_lm = self._jit_init(
            jnp.asarray(left, jnp.float32), jnp.asarray(right, jnp.float32),
            self.fs, self.maps, jnp.asarray(ts, jnp.float32),
        )
        self._prev_left = jnp.asarray(left, jnp.float32)
        return np.asarray(n_lm)

    def process_frames(self, left: np.ndarray, right: np.ndarray, ts: np.ndarray) -> np.ndarray:
        """One tracking step for the whole batch. Returns inlier counts."""
        cur = jnp.asarray(left, jnp.float32)
        out = self._jit_track(self.fs, self.maps, self._prev_left, cur)
        self.fs = out.state
        counts = np.asarray(out.counts)
        inliers = counts[:, 0]

        f = self.cfg.features
        need_kf = (inliers <= f.num_features_tracking_good) & (
            inliers > f.num_features_tracking_bad
        ) & self.alive
        self.alive &= inliers > f.num_features_tracking_bad
        if need_kf.any():
            self.fs, self.maps = self._jit_kf(
                jnp.asarray(need_kf), cur, jnp.asarray(right, jnp.float32),
                self.fs, self.maps, jnp.asarray(ts, jnp.float32),
            )
        self._prev_left = cur
        return inliers
