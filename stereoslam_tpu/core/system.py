"""System facade: construction, per-frame stepping, and result export.

The TPU-native counterpart of the reference ``System`` class (reference
src/system.cpp:18-97: Init wires components and spawns threads; RunStep
feeds the frontend; SaveTrajectory/SaveLoopEdges dump results).  Here there
are no threads: the facade owns the state pytrees and a set of
independently-jitted programs (track / stereo-init / make-keyframe /
bundle-adjust / loop-close).  JAX's async dispatch provides the pipeline
overlap the reference gets from pthreads: the host enqueues device programs
and only synchronizes on the few scalars that drive control flow
(inlier counts, loop-detection verdicts).
"""

from __future__ import annotations

import dataclasses
import logging
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stereoslam_tpu.config import SlamConfig
from stereoslam_tpu.core import backend as backend_mod
from stereoslam_tpu.core import frontend as frontend_mod
from stereoslam_tpu.core import loopclosing as loop_mod
from stereoslam_tpu.core.state import (
    INITING,
    LOST,
    TRACKING_BAD,
    TRACKING_GOOD,
    init_all,
)
from stereoslam_tpu.ops import se3
from stereoslam_tpu.ops.camera import Intrinsics
from stereoslam_tpu.ops.image import build_lk_pyramid
from stereoslam_tpu.utils import trajectory as traj_io
from stereoslam_tpu.utils.prof import Profiler

log = logging.getLogger(__name__)


class StereoSlam:
    """End-to-end stereo SLAM pipeline.

    Usage::

        slam = StereoSlam(cfg)
        for left, right, ts in frames:
            ok = slam.process_frame(left, right, ts)
            if not ok:
                break
        slam.save_trajectory("trajectory.txt")
    """

    def __init__(
        self,
        cfg: SlamConfig,
        enable_backend: bool = True,
        enable_loop: bool = True,
        mesh=None,
    ):
        """``mesh``: optional jax.sharding.Mesh — shards the loop-closure
        descriptor search and global pose graph over its "model" axis."""
        cfg.validate()
        self.cfg = cfg
        self.enable_backend = enable_backend
        self.enable_loop = enable_loop
        cam = cfg.camera
        self.intr_left = Intrinsics.create(cam.fx, cam.fy, cam.cx, cam.cy)
        self.intr_right = Intrinsics.create(cam.fx_right, cam.fy_right, cam.cx_right, cam.cy_right)
        self.baseline = cam.baseline

        self.fs, self.map, self.loop = init_all(cfg)
        self.async_ba = True   # overlap BA with tracking (reference-style)
        self._pending_ba = None
        self._pyr_prev = None
        self._frame_count = 0
        self._loop_edges: List[Tuple[int, int]] = []
        self.metrics: Dict[str, List[float]] = {"num_inliers": [], "num_tracked": []}
        self.profiler = Profiler()

        lk_levels = cfg.tracking.lk_levels
        # Optional image undistortion (reference camera.cpp:36-48), fused
        # into the on-device preprocessing via a precomputed remap grid.
        if cam.need_undistortion:
            from stereoslam_tpu.ops.camera import undistort_image, undistortion_map

            h, w = cfg.image_height, cfg.image_width
            map_l = undistortion_map(
                h, w, self.intr_left, jnp.asarray([cam.k1, cam.k2, cam.p1, cam.p2])
            )
            map_r = undistortion_map(
                h, w, self.intr_right,
                jnp.asarray([cam.k1_right, cam.k2_right, cam.p1_right, cam.p2_right]),
            )
            self._pre_left = lambda u8: undistort_image(u8.astype(jnp.float32), map_l)
            self._pre_right = lambda u8: undistort_image(u8.astype(jnp.float32), map_r)
        else:
            self._pre_left = self._pre_right = lambda u8: u8.astype(jnp.float32)

        # Images cross host->device as uint8 (4x less wire traffic — matters
        # a lot when the TPU sits behind a tunnel) and widen on device.
        self._jit_pyr = jax.jit(lambda u8: build_lk_pyramid(self._pre_left(u8), lk_levels))
        self._jit_pyr_right = jax.jit(
            lambda u8: build_lk_pyramid(self._pre_right(u8), lk_levels)
        )
        self._jit_img_f32 = jax.jit(self._pre_left)
        self._status = INITING

        def _track_fused(fs, m, pyr_prev, left_u8):
            # Pyramid construction fused into the tracking program: one
            # dispatch per frame, and the new pyramid is returned for reuse
            # as next frame's "previous".
            pyr = build_lk_pyramid(self._pre_left(left_u8), lk_levels)
            return frontend_mod.track_step(fs, m, pyr_prev, pyr, self.intr_left, cfg), pyr

        self._jit_track_fused = jax.jit(_track_fused)
        self._jit_track = jax.jit(
            partial(
                frontend_mod.track_step,
                intr=self.intr_left,
                cfg=cfg,
            )
        )
        self._jit_stereo_init = jax.jit(
            partial(
                frontend_mod.stereo_init_step,
                intr_left=self.intr_left,
                intr_right=self.intr_right,
                baseline=self.baseline,
                cfg=cfg,
            )
        )
        self._jit_make_kf = jax.jit(
            partial(
                frontend_mod.make_keyframe_step,
                intr_left=self.intr_left,
                intr_right=self.intr_right,
                baseline=self.baseline,
                cfg=cfg,
            )
        )
        if enable_backend:
            self._jit_ba = jax.jit(
                partial(backend_mod.optimize_active_map, intr=self.intr_left, cfg=cfg)
            )
        if enable_loop:
            self._loop_closer = loop_mod.LoopCloser(cfg, self.intr_left, mesh=mesh)

    # ------------------------------------------------------------------
    def process_frame(self, left: np.ndarray, right: np.ndarray, timestamp: float) -> bool:
        """Track one stereo frame (System::RunStep, system.cpp:92-97).

        Returns False once tracking is LOST (the reference quits then,
        frontend.cpp:64-67 — relocalization is an explicit non-goal there).
        """
        if self._status == LOST:
            return False

        rec = self.profiler.start_frame(self._frame_count, float(timestamp))
        left_u8 = jax.device_put(np.asarray(left).astype(np.uint8))
        ts = jnp.float32(timestamp)

        if self._status == INITING:
            pyr_left = self._jit_pyr(left_u8)
            left_f32 = self._jit_img_f32(left_u8)
            right_u8 = jax.device_put(np.asarray(right).astype(np.uint8))
            pyr_right = self._jit_pyr_right(right_u8)
            fs, m, kf_id, n_lm = self._jit_stereo_init(
                left_f32, pyr_left, pyr_right, self.fs, self.map, timestamp=ts
            )
            if int(n_lm) >= self.cfg.features.num_features_init_good:
                self._status = TRACKING_GOOD
                self.fs = fs._replace(status=jnp.int32(TRACKING_GOOD))
                self.map = m
                self._after_keyframe(left_f32, pyr_left, int(kf_id))
                log.info("stereo init: %d landmarks, KF %d", int(n_lm), int(kf_id))
            else:
                # Init failed — stay INITING, try next frame (frontend.cpp:64).
                log.info("stereo init failed: only %d landmarks", int(n_lm))
            rec.status = self._status
            self.profiler.end_frame()
            self._pyr_prev = pyr_left
            self._frame_count += 1
            return True

        self._poll_async()
        with self.profiler.stage("track"):
            out, pyr_left = self._jit_track_fused(
                self.fs, self.map, self._pyr_prev, left_u8
            )
            counts = np.asarray(out.counts)  # single host pull for both scalars
        n_inliers = int(counts[0])
        self.metrics["num_inliers"].append(n_inliers)
        self.metrics["num_tracked"].append(int(counts[1]))
        rec.num_inliers, rec.num_tracked = n_inliers, int(counts[1])
        self.fs = out.state

        f = self.cfg.features
        if n_inliers > f.num_features_tracking_good:
            self._status = TRACKING_GOOD
        elif n_inliers > f.num_features_tracking_bad:
            self._status = TRACKING_BAD
        else:
            self._status = LOST

        if self._status == LOST:
            log.warning("tracking LOST at frame %d (%d inliers)", self._frame_count, n_inliers)
            rec.status = self._status
            self.profiler.end_frame()
            self._pyr_prev = pyr_left
            self._frame_count += 1
            return False

        if self._status == TRACKING_BAD:
            # Tracking got weak -> new keyframe (frontend.cpp:111-119).
            self._flush_pending_ba()
            left_f32 = self._jit_img_f32(left_u8)
            right_u8 = jax.device_put(np.asarray(right).astype(np.uint8))
            pyr_right = self._jit_pyr_right(right_u8)
            with self.profiler.stage("make_kf"):
                self.fs, self.map, kf_id = self._jit_make_kf(
                    left_f32, pyr_left, pyr_right, self.fs, self.map, timestamp=ts
                )
            rec.keyframe_id = int(kf_id)
            self._after_keyframe(left_f32, pyr_left, int(kf_id))

        rec.status = self._status
        self.profiler.end_frame()
        self._pyr_prev = pyr_left
        self._frame_count += 1
        return True

    # ------------------------------------------------------------------
    def _after_keyframe(self, left, pyr_left, kf_id: int) -> None:
        """Backend BA + loop closing for a freshly inserted keyframe —
        the work the reference's backend/loop threads do (backend.cpp:74-103,
        loopclosing.cpp:52-80).

        Pipeline overlap: JAX async dispatch enqueues BA (and descriptor
        extraction) without blocking; tracking of subsequent frames reads the
        pre-BA map ("stale read under the map lock", exactly the reference's
        concurrency model, map.h:64) and the refined map is swapped in by
        :meth:`_poll_async` once the device finishes it.
        """
        if self.enable_loop:
            self.loop = self._loop_closer.process_keyframe(
                self.map, self.loop, left, pyr_left, jnp.int32(kf_id)
            )
        if self.enable_backend:
            if self.async_ba:
                self._pending_ba = self._jit_ba(self.map)  # enqueued, not awaited
            else:
                self.map = self._jit_ba(self.map)
        self._run_loop_closing(kf_id)

    def _run_loop_closing(self, kf_id: int) -> None:
        if not self.enable_loop:
            return
        # Loop correction rewrites the map; it must see the BA result
        # (the reference pauses the backend here, loopclosing.cpp:445-449).
        self._flush_pending_ba()
        self.map, self.loop, closed, loop_kf = self._loop_closer.detect_and_correct(
            self.map, self.loop, jnp.int32(kf_id)
        )
        if closed:
            self._loop_edges.append((kf_id, int(loop_kf)))
            if self.profiler._current is not None:
                self.profiler._current.loop_closed_with = int(loop_kf)
            # The frontend pose is KF-relative, so the corrected KF pose
            # propagates automatically; only the landmark-merge remap
            # needs applying to live tracks (the reference gets this via
            # shared mappoint pointers, loopclosing.cpp:521-529).
            tracks = self.fs.tracks._replace(
                lm_idx=self._loop_closer.remap_tracks(self.fs.tracks.lm_idx)
            )
            self.fs = self.fs._replace(tracks=tracks)
            log.info("loop closed: KF %d -> KF %d", kf_id, int(loop_kf))

    def _flush_pending_ba(self) -> None:
        if self._pending_ba is not None:
            self.map = self._pending_ba
            self._pending_ba = None

    def _poll_async(self) -> None:
        """Swap in a finished BA result without blocking (the frontend keeps
        tracking against the stale map meanwhile, like the reference)."""
        if self._pending_ba is not None:
            ready = all(
                leaf.is_ready() if hasattr(leaf, "is_ready") else True
                for leaf in jax.tree.leaves(self._pending_ba)
            )
            if ready:
                self._flush_pending_ba()

    # ------------------------------------------------------------------
    @property
    def status(self) -> int:
        """Frontend status (INITING/TRACKING_GOOD/TRACKING_BAD/LOST),
        maintained host-side to avoid a device sync per query."""
        return self._status

    # ------------------------------------------------------------------
    def current_pose(self) -> np.ndarray:
        """Absolute T_cw of the latest tracked frame."""
        ref = int(self.fs.ref_kf)
        T_kf = np.asarray(self.map.kf_T_cw[ref]) if ref >= 0 else np.eye(4, dtype=np.float32)
        return np.asarray(self.fs.T_rk) @ T_kf

    # ------------------------------------------------------------------
    def keyframe_trajectory(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(kf_ids, timestamps, T_cw) for all valid keyframes."""
        self._flush_pending_ba()
        n = int(self.map.n_kf)
        ids = np.arange(n)
        ts = np.asarray(self.map.kf_timestamp)[:n]
        T = np.asarray(self.map.kf_T_cw)[:n]
        return ids, ts, T

    def save_trajectory(self, path: str) -> None:
        ids, ts, T = self.keyframe_trajectory()
        traj_io.save_trajectory(path, ids, ts, T)

    def save_loop_edges(self, path: str) -> None:
        ids, ts, T = self.keyframe_trajectory()
        traj_io.save_loop_edges(path, self._loop_edges, ids, ts, T)

    @property
    def loop_edges(self) -> List[Tuple[int, int]]:
        return list(self._loop_edges)

    # ------------------------------------------------------------------
    def save_checkpoint(self, path: str) -> str:
        """Snapshot the full SLAM state (map + tracks + loop DB) — a
        capability the reference lacks entirely (SURVEY.md §5)."""
        from stereoslam_tpu.utils import checkpoint as ckpt

        self._flush_pending_ba()
        fs = self.fs._replace(status=jnp.int32(self._status))
        return ckpt.save_checkpoint(path, fs, self.map, self.loop, pyr=self._pyr_prev)

    def load_checkpoint(self, path: str) -> None:
        from stereoslam_tpu.utils import checkpoint as ckpt

        self.fs, self.map, self.loop, pyr = ckpt.load_checkpoint(path)
        self._status = int(self.fs.status)
        self._pyr_prev = pyr
