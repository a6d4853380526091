"""Backend: sliding-window bundle adjustment over the active map.

Replaces the reference backend thread (reference src/backend.cpp:74-269)
with one jitted program: gather the active window's observations out of the
map arrays, compact the touched landmarks, run Schur-complement LM
(:mod:`stereoslam_tpu.ops.schur`), then scatter results back — pose/landmark
write-back, outlier unlinking, and orphan-landmark pruning exactly mirroring
backend.cpp:236-266.  The reference's queue/pause machinery disappears: the
caller decides when to run BA, and the map is a value, not a shared object.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stereoslam_tpu.config import SlamConfig
from stereoslam_tpu.core.state import MapState
from stereoslam_tpu.ops import se3
from stereoslam_tpu.ops.camera import Intrinsics
from stereoslam_tpu.ops.schur import BAProblem, solve_window_ba


def optimize_active_map(map_state: MapState, intr: Intrinsics, cfg: SlamConfig) -> MapState:
    """One backend BA pass (Backend::OptimizeActiveMap, backend.cpp:126-269)."""
    W = map_state.active_kf.shape[0]
    N = map_state.kf_feat_valid.shape[1]
    C = W * N  # compacted landmark capacity: cannot overflow

    kf_idx = map_state.active_kf                      # (W,)
    cam_valid = kf_idx >= 0
    kf_safe = jnp.maximum(kf_idx, 0)

    cam_T = map_state.kf_T_cw[kf_safe]                # (W, 4, 4)
    obs_px = map_state.kf_feat_xy[kf_safe]            # (W, N, 2)
    obs_lm_global = map_state.kf_feat_lm[kf_safe]     # (W, N)
    obs_valid = (
        map_state.kf_feat_valid[kf_safe]
        & (obs_lm_global >= 0)
        & cam_valid[:, None]
    )
    lm_safe = jnp.maximum(obs_lm_global, 0)
    obs_valid = obs_valid & map_state.lm_valid[lm_safe] & ~map_state.lm_outlier[lm_safe]

    # Compact the touched landmark ids into C slots.  Sentinel = capacity_lm
    # sorts after every real id, so unique() packs real ids first.
    L = map_state.capacity_lm
    sentinel = jnp.int32(L)
    ids_flat = jnp.where(obs_valid, obs_lm_global, sentinel).reshape(-1)
    uniq = jnp.unique(ids_flat, size=C, fill_value=sentinel)  # (C,) sorted
    slot_of_obs = jnp.searchsorted(uniq, ids_flat).reshape(W, N)
    slot_of_obs = jnp.minimum(slot_of_obs, C - 1)
    lm_slot_valid = uniq < sentinel
    uniq_safe = jnp.where(lm_slot_valid, uniq, 0)

    lm_pos_c = map_state.lm_pos[uniq_safe]
    # Fixed iff first-observing KF is not in the active window
    # (backend.cpp:175-177) — constraint-only landmarks pin the gauge.
    first_kf = map_state.lm_first_kf[uniq_safe]       # (C,)
    in_window = jnp.any(first_kf[:, None] == kf_idx[None, :], axis=1) & (first_kf >= 0)
    lm_fixed = ~in_window

    cam_fixed = (
        (jnp.arange(W) == 0) & cam_valid
        if cfg.backend.fix_oldest_kf
        else jnp.zeros((W,), bool)
    )
    prob = BAProblem(
        cam_T=cam_T,
        cam_valid=cam_valid,
        cam_fixed=cam_fixed,
        lm_pos=lm_pos_c,
        lm_valid=lm_slot_valid,
        lm_fixed=lm_fixed,
        obs_px=obs_px,
        obs_lm=slot_of_obs,
        obs_valid=obs_valid,
    )
    res = solve_window_ba(
        prob,
        intr,
        rounds=cfg.backend.ba_rounds,
        iters=cfg.backend.ba_iters,
        chi2_threshold=cfg.backend.chi2_threshold,
        huber_delta=cfg.backend.chi2_threshold,
    )

    # Masked scatters: out-of-bounds indices are dropped by JAX's default
    # scatter mode, so invalid slots write nowhere (no duplicate-index races).
    K = map_state.capacity_kf
    kf_scatter = jnp.where(cam_valid, kf_idx, K)
    # ---- write back poses (backend.cpp:256-258) ----
    kf_T_cw = map_state.kf_T_cw.at[kf_scatter].set(res.cam_T, mode="drop")

    # ---- refresh in-window sequential pose-graph edges ----
    # The reference records mRelativePoseToLastKF once at KF creation
    # (keyframe.cpp:34-50) and lets BA refinements drift away from it, so
    # its pose graph carries a residual floor.  Here, whenever both
    # endpoints of a sequential edge sit in the window just optimized, the
    # edge measurement is re-derived from the refined poses — the pose
    # graph then encodes the best available odometry, which keeps the
    # loop-correction consistency gate sharp (core/loopclosing.py step 7).
    prev_idx = map_state.kf_prev[kf_safe]                    # (W,)
    prev_match = prev_idx[:, None] == kf_idx[None, :]        # (W, W)
    prev_in = jnp.any(prev_match, axis=1) & (prev_idx >= 0) & cam_valid
    prev_slot = jnp.argmax(prev_match, axis=1)
    rel_new = res.cam_T @ se3.inv(res.cam_T[prev_slot])
    kf_rel_prev = map_state.kf_rel_prev.at[
        jnp.where(prev_in, kf_idx, K)
    ].set(rel_new, mode="drop")
    # ---- write back landmark positions (backend.cpp:259-261) ----
    moved = lm_slot_valid & ~lm_fixed
    lm_scatter = jnp.where(moved, uniq_safe, L)
    lm_pos = map_state.lm_pos.at[lm_scatter].set(res.lm_pos, mode="drop")

    # ---- outlier handling (backend.cpp:236-251): unlink feature<->landmark ----
    outlier_obs = obs_valid & ~res.obs_inlier
    new_feat_lm_rows = jnp.where(outlier_obs, -1, obs_lm_global)
    kf_feat_lm = map_state.kf_feat_lm.at[kf_scatter].set(new_feat_lm_rows, mode="drop")

    # ---- orphan landmarks -> outliers (backend.cpp:243-247): a landmark with
    # no remaining observation anywhere is dead.  Counts are maintained
    # incrementally (insert_keyframe adds, unlinking subtracts) so this is a
    # window-sized scatter, not a rescan of every keyframe row.
    dec_target = jnp.where(outlier_obs, lm_safe, L).reshape(-1)
    lm_obs_count = map_state.lm_obs_count.at[dec_target].add(-1, mode="drop")
    lm_obs_count = jnp.maximum(lm_obs_count, 0)
    # Grace period: a landmark whose first-observer KF is still in the
    # active window may legitimately have zero registered KF observations —
    # mid-stream replenished landmarks (frontend.py replenish_branch) only
    # get their row at the NEXT keyframe.  Those are spared; once the window
    # slides past the anchor KF an observation-less landmark is dead (the
    # reference's deferred outlier cleanup, map.cpp:126-140).
    first_all = map_state.lm_first_kf                       # (L,)
    first_in_window = jnp.any(
        first_all[:, None] == jnp.where(cam_valid, kf_idx, -2)[None, :], axis=1
    )
    orphan = map_state.lm_valid & (lm_obs_count == 0) & ~first_in_window
    lm_outlier = map_state.lm_outlier | orphan

    return map_state._replace(
        kf_T_cw=kf_T_cw,
        kf_rel_prev=kf_rel_prev,
        lm_pos=lm_pos,
        kf_feat_lm=kf_feat_lm,
        lm_obs_count=lm_obs_count,
        lm_outlier=lm_outlier,
    )
