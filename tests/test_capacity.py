"""Capacity-overflow guards (VERDICT r3 missing #4).

The reference's dynamic map cannot overflow (reference map.cpp:17-48); the
fixed device arrays here can.  These tests pin the saturation contract:
overflow is LOUD (host warning, -2 sentinel) and BOUNDED (no silent
corruption of existing rows, tracking survives), and the landmark table has
a compaction path that reclaims dead rows (core/maintenance.py).
"""

import logging

import jax.numpy as jnp
import numpy as np

from stereoslam_tpu.config import CameraConfig, FeatureConfig, MapConfig, SlamConfig
from stereoslam_tpu.core.maintenance import compact_landmarks
from stereoslam_tpu.core.state import init_map_state, init_track_state
from stereoslam_tpu.core.system import StereoSlam
from stereoslam_tpu.utils.synthetic import generate_sequence


def tiny_cfg(seq, max_kf=3, max_lm=512):
    return SlamConfig(
        camera=CameraConfig(
            fx=seq.fx, fy=seq.fy, cx=seq.cx, cy=seq.cy,
            fx_right=seq.fx, fy_right=seq.fy, cx_right=seq.cx, cy_right=seq.cy,
            bf=seq.fx * seq.baseline,
        ),
        features=FeatureConfig(
            n_init_features=64, n_new_features=32, max_features=64,
            num_features_init_good=16, num_features_tracking_good=12,
            num_features_tracking_bad=4,
        ),
        map=MapConfig(max_keyframes=max_kf, max_landmarks=max_lm),
        image_height=120, image_width=160,
    )


def test_keyframe_overflow_saturates_loudly(caplog):
    """Running past max_keyframes must not corrupt the map: n_kf stops at
    capacity, existing rows stay intact, tracking keeps going, and the host
    logs an error (round 3 silently clobbered row K-1 via scatter-clamp)."""
    seq = generate_sequence(n_frames=30, h=120, w=160, fx=120.0, n_points=800,
                            trajectory="forward", speed=0.5, seed=2)
    cfg = tiny_cfg(seq)
    slam = StereoSlam(cfg, enable_backend=True, enable_loop=False)

    row_snapshots = {}
    with caplog.at_level(logging.ERROR):
        for t in range(30):
            if not slam.process_frame(seq.left[t], seq.right[t], seq.timestamps[t]):
                break
            if int(np.asarray(slam.map.n_kf)) == 3 and 0 not in row_snapshots:
                slam._drain()
                row_snapshots[0] = np.asarray(slam.map.kf_frame_id[:3]).copy()
        slam._drain()

    assert int(slam.map.n_kf) == 3
    assert slam._warned_kf_full
    assert any("keyframe table FULL" in r.message for r in caplog.records)
    # The three real rows kept their identities (no clobbering of row K-1).
    np.testing.assert_array_equal(
        np.asarray(slam.map.kf_frame_id[:3]), row_snapshots[0]
    )
    # Trajectory export still works and is finite.
    ids, T = slam.frame_trajectory()
    assert len(ids) >= 25 and np.isfinite(T).all()


def test_keyframe_overflow_checkpoint_roundtrip(tmp_path):
    """A saturated system checkpoints and resumes without corruption."""
    seq = generate_sequence(n_frames=24, h=120, w=160, fx=120.0, n_points=800,
                            trajectory="forward", speed=0.5, seed=3)
    cfg = tiny_cfg(seq)
    slam = StereoSlam(cfg, enable_backend=False, enable_loop=False)
    for t in range(24):
        if not slam.process_frame(seq.left[t], seq.right[t], seq.timestamps[t]):
            break
    p = str(tmp_path / "sat.npz")
    slam.save_checkpoint(p)
    slam2 = StereoSlam(cfg, enable_backend=False, enable_loop=False)
    slam2.load_checkpoint(p)
    assert int(slam2.map.n_kf) == int(slam.map.n_kf) <= 3


def test_compact_landmarks_reclaims_dead_rows():
    """compact_landmarks packs live rows first, remaps every reference, and
    frees the dead tail for reallocation."""
    cfg = tiny_cfg(generate_sequence(n_frames=1, h=120, w=160, fx=120.0,
                                     n_points=10, seed=1), max_lm=64)
    m = init_map_state(cfg)
    tracks = init_track_state(cfg)
    L = 64
    rng = np.random.default_rng(0)
    pos = rng.standard_normal((L, 3)).astype(np.float32)
    valid = np.zeros(L, bool); valid[:40] = True
    outlier = np.zeros(L, bool); outlier[[3, 7, 11, 20]] = True  # dead rows
    first = np.where(valid, rng.integers(0, 3, L), -1).astype(np.int32)
    m = m._replace(
        lm_pos=jnp.asarray(pos), lm_valid=jnp.asarray(valid),
        lm_outlier=jnp.asarray(outlier), lm_first_kf=jnp.asarray(first),
        lm_obs_count=jnp.asarray(np.where(valid, 2, 0).astype(np.int32)),
        n_lm=jnp.int32(40),
        kf_feat_lm=m.kf_feat_lm.at[0, :8].set(
            jnp.asarray([0, 3, 5, 7, 12, -1, 20, 39], jnp.int32)
        ),
    )
    tracks = tracks._replace(
        lm_idx=tracks.lm_idx.at[:4].set(jnp.asarray([5, 3, 39, -1], jnp.int32))
    )

    m2, tracks2, freed = compact_landmarks(m, tracks)
    assert int(freed) == 4
    assert int(m2.n_lm) == 36
    v2 = np.asarray(m2.lm_valid)
    assert v2[:36].all() and not v2[36:].any()

    # Every old live id maps to the row holding the same position.
    old_pos = pos
    new_pos = np.asarray(m2.lm_pos)
    feats = np.asarray(m2.kf_feat_lm[0, :8])
    old_feats = [0, 3, 5, 7, 12, -1, 20, 39]
    for old, new in zip(old_feats, feats):
        if old < 0:
            assert new == old
        elif outlier[old]:
            assert new == -1  # dead reference severed
        else:
            np.testing.assert_allclose(new_pos[new], old_pos[old])
    # Track remap agrees.
    tr = np.asarray(tracks2.lm_idx[:4])
    assert tr[1] == -1 and tr[3] == -1
    np.testing.assert_allclose(new_pos[tr[0]], old_pos[5])
    np.testing.assert_allclose(new_pos[tr[2]], old_pos[39])


def test_landmark_pressure_triggers_compaction(caplog):
    """End-to-end: a tiny landmark table forces the pressure path — the
    system compacts instead of silently dropping fresh triangulations."""
    seq = generate_sequence(n_frames=40, h=120, w=160, fx=120.0, n_points=800,
                            trajectory="forward", speed=0.5, seed=4)
    cfg = tiny_cfg(seq, max_kf=64, max_lm=90)
    slam = StereoSlam(cfg, enable_backend=True, enable_loop=False)
    with caplog.at_level(logging.WARNING):
        for t in range(40):
            if not slam.process_frame(seq.left[t], seq.right[t], seq.timestamps[t]):
                break
        slam._drain()
    assert any("compacted" in r.message for r in caplog.records), (
        "landmark pressure never triggered compaction"
    )
    # Allocation continued past the raw capacity thanks to reclaimed rows.
    assert int(slam.map.n_lm) <= 90
    ids, T = slam.frame_trajectory()
    assert np.isfinite(T).all()
