"""Fixed-shape SLAM state pytrees.

The TPU-native replacement for the reference's pointer-graph data model
(L2: Frame/KeyFrame/Feature/MapPoint/Map, reference include/myslam/frame.h,
keyframe.h, feature.h, mappoint.h, map.h).  Where the reference holds a web
of ``shared_ptr``/``weak_ptr`` objects guarded by per-object mutexes and one
big map lock (map.h:64), here the entire map lives in preallocated device
arrays addressed by integer ids, and every pipeline stage is a pure function
``state -> state`` — data races are impossible by construction, and state
updates are masked scatters that XLA fuses.

Id conventions: landmark/keyframe slot index == id. ``-1`` means "no link"
(the reference's expired ``weak_ptr``).  Counters (``n_kf`` etc.) are device
scalars so allocation happens inside jit.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from stereoslam_tpu.config import SlamConfig
from stereoslam_tpu.ops import se3

INITING, TRACKING_GOOD, TRACKING_BAD, LOST = 0, 1, 2, 3  # frontend.h:19


class TrackState(NamedTuple):
    """Per-frame feature tracks (the live ``Frame::mvpFeaturesLeft``,
    reference frame.h:52)."""

    xy: jnp.ndarray       # (N, 2) f32 — feature positions in the current left image
    lm_idx: jnp.ndarray   # (N,) i32 — landmark id or -1
    valid: jnp.ndarray    # (N,) bool


class FrontendState(NamedTuple):
    """Everything the tracking loop carries frame to frame.

    The frame pose is stored RELATIVE to the reference keyframe
    (``T_cw = T_rk @ kf_T_cw[ref_kf]``), exactly like the reference's
    ``Frame::mRelativePose`` anchoring (frame.h:41-47, frontend.cpp:54):
    when the backend or loop closer rewrites keyframe poses, the frontend's
    absolute pose follows automatically — no locks, no re-anchoring step.
    """

    tracks: TrackState
    T_rk: jnp.ndarray         # (4, 4) pose relative to the reference KF
    T_vel: jnp.ndarray        # (4, 4) constant-velocity model: T_rk' = T_vel @ T_rk
    ref_kf: jnp.ndarray       # () i32 — reference keyframe id (frame.h:44)
    status: jnp.ndarray       # () i32 — INITING/GOOD/BAD/LOST
    frame_id: jnp.ndarray     # () i32


class MapState(NamedTuple):
    """Global + active map (reference map.h:74-79) as flat arrays."""

    # Keyframes
    kf_T_cw: jnp.ndarray        # (K, 4, 4)
    kf_timestamp: jnp.ndarray   # (K,) f64-as-f32 pair? stored f32 seconds offset
    kf_frame_id: jnp.ndarray    # (K,) i32
    kf_valid: jnp.ndarray       # (K,) bool
    kf_feat_xy: jnp.ndarray     # (K, N, 2) f32 — left-image features at KF creation
    kf_feat_lm: jnp.ndarray     # (K, N) i32 — landmark links
    kf_feat_valid: jnp.ndarray  # (K, N) bool
    # Pose-graph links (keyframe.h:42-46)
    kf_prev: jnp.ndarray        # (K,) i32 — previous KF id (mpLastKF)
    kf_rel_prev: jnp.ndarray    # (K, 4, 4) — T_cw_this @ inv(T_cw_prev) at link time
    kf_loop: jnp.ndarray        # (K,) i32 — loop KF id or -1 (mpLoopKF)
    kf_rel_loop: jnp.ndarray    # (K, 4, 4) — relative pose to loop KF
    n_kf: jnp.ndarray           # () i32
    # Landmarks (mappoint.h:45-61)
    lm_pos: jnp.ndarray         # (L, 3) f32
    lm_valid: jnp.ndarray       # (L,) bool
    lm_outlier: jnp.ndarray     # (L,) bool
    lm_first_kf: jnp.ndarray    # (L,) i32 — first observing KF (BA gauge + loop realign)
    lm_obs_count: jnp.ndarray   # (L,) i32 — total KF observations (mappoint.h:49 observation
                                # list size, kept incrementally so the backend's orphan check
                                # never rescans every keyframe row)
    n_lm: jnp.ndarray           # () i32
    # Active window (map.h:51-57)
    active_kf: jnp.ndarray      # (W,) i32, -1 for empty, ordered oldest->newest
    n_active: jnp.ndarray       # () i32
    # Frame id of the last windowed-BA run (backend busy-coalescing: the
    # reference backend thread collapses map-update signals that arrive
    # while an optimization is in flight, backend.cpp:74-103 — keyframes
    # landing inside the previous BA's wall-time window get no BA of their
    # own.  ba_min_frame_spacing expresses that wall time in frames.)
    last_ba_frame: jnp.ndarray  # () i32

    @property
    def capacity_kf(self) -> int:
        return self.kf_valid.shape[0]

    @property
    def capacity_lm(self) -> int:
        return self.lm_valid.shape[0]


class LoopState(NamedTuple):
    """Loop-closure keyframe database (reference loopclosing.h:109-117 +
    the per-KF descriptors of keyframe.h:49-52)."""

    deep_db: jnp.ndarray      # (K, D) f32 — L2-normalized global descriptors
    db_valid: jnp.ndarray     # (K,) bool — inserted into the search database
    orb_desc: jnp.ndarray     # (K, M, 8) u32 — pyramid-expanded BRIEF descriptors
    orb_xy: jnp.ndarray       # (K, M, 2) f32 — keypoint positions (level-0 frame)
    orb_class: jnp.ndarray    # (K, M) i32 — class id = source feature slot (dedup key)
    orb_valid: jnp.ndarray    # (K, M) bool
    last_closed_kf: jnp.ndarray  # () i32 — id of last corrected KF (cooldown, loopclosing.cpp:674)


def init_track_state(cfg: SlamConfig) -> TrackState:
    n = cfg.features.max_features
    return TrackState(
        xy=jnp.zeros((n, 2), jnp.float32),
        lm_idx=jnp.full((n,), -1, jnp.int32),
        valid=jnp.zeros((n,), bool),
    )


def init_frontend_state(cfg: SlamConfig) -> FrontendState:
    return FrontendState(
        tracks=init_track_state(cfg),
        T_rk=se3.identity(),
        T_vel=se3.identity(),
        ref_kf=jnp.int32(-1),
        status=jnp.int32(INITING),
        frame_id=jnp.int32(0),
    )


def init_map_state(cfg: SlamConfig) -> MapState:
    K = cfg.map.max_keyframes
    L = cfg.map.max_landmarks
    N = cfg.features.max_features
    W = cfg.map.active_window
    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (K, 4, 4))
    return MapState(
        kf_T_cw=eye,
        kf_timestamp=jnp.zeros((K,), jnp.float32),
        kf_frame_id=jnp.zeros((K,), jnp.int32),
        kf_valid=jnp.zeros((K,), bool),
        kf_feat_xy=jnp.zeros((K, N, 2), jnp.float32),
        kf_feat_lm=jnp.full((K, N), -1, jnp.int32),
        kf_feat_valid=jnp.zeros((K, N), bool),
        kf_prev=jnp.full((K,), -1, jnp.int32),
        kf_rel_prev=eye,
        kf_loop=jnp.full((K,), -1, jnp.int32),
        kf_rel_loop=eye,
        n_kf=jnp.int32(0),
        lm_pos=jnp.zeros((L, 3), jnp.float32),
        lm_valid=jnp.zeros((L,), bool),
        lm_outlier=jnp.zeros((L,), bool),
        lm_first_kf=jnp.full((L,), -1, jnp.int32),
        lm_obs_count=jnp.zeros((L,), jnp.int32),
        n_lm=jnp.int32(0),
        active_kf=jnp.full((W,), -1, jnp.int32),
        n_active=jnp.int32(0),
        last_ba_frame=jnp.int32(-(1 << 30)),
    )


def init_loop_state(cfg: SlamConfig) -> LoopState:
    K = cfg.map.max_keyframes
    D = cfg.loop.descriptor_dim
    M = cfg.features.max_features * cfg.features.n_levels
    return LoopState(
        deep_db=jnp.zeros((K, D), jnp.float32),
        db_valid=jnp.zeros((K,), bool),
        orb_desc=jnp.zeros((K, M, 8), jnp.uint32),
        orb_xy=jnp.zeros((K, M, 2), jnp.float32),
        orb_class=jnp.full((K, M), -1, jnp.int32),
        orb_valid=jnp.zeros((K, M), bool),
        last_closed_kf=jnp.int32(-(10**6)),
    )


def init_all(cfg: SlamConfig) -> Tuple[FrontendState, MapState, LoopState]:
    return init_frontend_state(cfg), init_map_state(cfg), init_loop_state(cfg)
