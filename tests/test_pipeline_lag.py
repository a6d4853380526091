"""Correctness coverage for the pipelined (lag-N readback) frame loop.

The TPU perf path runs with ``readback_lag=10`` (core/system.py): frame
outcomes are read back N frames late so the host never blocks on the
tunnel round-trip.  The KF decision itself is on-device (frame_step's
lax.cond), so the device-side state evolution must not depend on when
the host *learns* the outcomes; only the timing of host-launched
keyframe work (BA, loop closing) shifts.  These tests pin that contract:
lagged runs must produce the same keyframes and essentially the same
trajectory as the synchronous run (reference analog: the backend thread
overlap, backend.cpp:74-103, which tolerates exactly this staleness).
"""

import numpy as np
import pytest

from stereoslam_tpu.core.system import StereoSlam
from stereoslam_tpu.utils.metrics import ate_rmse
from stereoslam_tpu.utils.synthetic import generate_sequence

from test_system_vo import make_cfg


@pytest.fixture(scope="module")
def seq():
    return generate_sequence(n_frames=40, trajectory="forward", seed=3)


def run_with_lag(seq, lag, enable_backend=True, enable_loop=False):
    cfg = make_cfg(seq)
    slam = StereoSlam(
        cfg,
        enable_backend=enable_backend,
        enable_loop=enable_loop,
        readback_lag=lag,
    )
    est = []
    for t in range(len(seq.left)):
        ok = slam.process_frame(seq.left[t], seq.right[t], seq.timestamps[t])
        assert ok, f"lag={lag}: lost at frame {t}"
        est.append(slam.current_pose())
    slam._drain()
    return slam, np.stack(est)


@pytest.mark.parametrize("lag", [1, 3, 10])
def test_lagged_run_matches_synchronous(seq, lag):
    slam0, est0 = run_with_lag(seq, 0)
    slamN, estN = run_with_lag(seq, lag)

    # Identical keyframe decisions: same KF count and same source frames.
    assert int(slamN.map.n_kf) == int(slam0.map.n_kf)
    n = int(slam0.map.n_kf)
    np.testing.assert_array_equal(
        np.asarray(slamN.map.kf_frame_id[:n]), np.asarray(slam0.map.kf_frame_id[:n])
    )

    # Trajectories agree to numerical noise.  BA launch timing legitimately
    # shifts by `lag` frames (BA refines the then-current map, the
    # reference's stale-read-under-map-lock semantics), so allow a small
    # tolerance rather than bitwise equality.
    ate = ate_rmse(np.linalg.inv(est0), np.linalg.inv(estN), align=False)
    assert ate < 0.02, f"lag={lag} diverged from synchronous run: ATE {ate:.4f} m"


def test_frame_trajectory_matches_polled_poses(seq):
    """frame_trajectory() (sync-free lag-N pose log) must equal per-frame
    current_pose() polling when the KF table is never refined afterwards
    (backend off), at any lag."""
    cfg = make_cfg(seq)
    for lag in (0, 4):
        slam = StereoSlam(cfg, enable_backend=False, enable_loop=False,
                          readback_lag=lag)
        polled = []
        for t in range(24):
            assert slam.process_frame(seq.left[t], seq.right[t], seq.timestamps[t])
            polled.append(slam.current_pose())
        fids, T = slam.frame_trajectory()
        assert list(fids) == list(range(24))
        np.testing.assert_allclose(T, np.stack(polled), rtol=0, atol=1e-5)


def test_lagged_lost_is_reported_within_lag(seq):
    cfg = make_cfg(seq)
    slam = StereoSlam(cfg, enable_backend=False, enable_loop=False, readback_lag=4)
    black = np.zeros_like(seq.left[0])
    assert slam.process_frame(seq.left[0], seq.right[0], 0.0)  # init (sync)
    for t in range(1, 4):
        assert slam.process_frame(seq.left[t], seq.right[t], 0.1 * t)
    # Feed black frames: tracking dies on-device immediately; the host must
    # report it within `lag` frames (not never).
    died_at = None
    for k in range(8):
        if not slam.process_frame(black, black, 1.0 + 0.1 * k):
            died_at = k
            break
    assert died_at is not None and died_at <= 4 + 1


def test_zero_device_syncs_per_tracked_frame(seq, monkeypatch):
    """The steady-state tracked-frame path must perform ZERO synchronous
    device fetches (``jax.device_get``): outcomes travel via the two
    async-prefetched buffers (counts, T_rk) only.  Round 2 regressed to one
    cold ``device_get`` per frame in ``_retire`` — a per-frame tunnel round
    trip that collapsed full-pipeline FPS from 88.9 to 18.6 (VERDICT r2 #1);
    this test makes that class of regression loud."""
    import dataclasses

    import jax

    cfg = make_cfg(seq)
    # Disable the motion-clock KF trigger and replenishment: this test needs
    # a guaranteed KF-free steady-state stretch to isolate per-frame syncs.
    cfg = cfg.replace(tracking=dataclasses.replace(
        cfg.tracking, kf_max_interval=0, replenish_min_inliers=0))
    slam = StereoSlam(cfg, enable_backend=False, enable_loop=False,
                      readback_lag=4)
    # Warm up past init + first keyframes so we are in the steady state.
    for t in range(10):
        assert slam.process_frame(seq.left[t], seq.right[t], seq.timestamps[t])

    calls = []
    real_get = jax.device_get
    monkeypatch.setattr(jax, "device_get", lambda *a, **k: (
        calls.append(a), real_get(*a, **k))[1])
    kf_before = int(np.asarray(slam.map.n_kf))
    for t in range(10, 20):
        assert slam.process_frame(seq.left[t], seq.right[t], seq.timestamps[t])
    kf_after = int(np.asarray(slam.map.n_kf))
    assert kf_after == kf_before, "test needs a KF-free steady-state stretch"
    assert calls == [], f"{len(calls)} device_get syncs on tracked frames"
    # Latency accounting exists and is per-frame (enqueue -> retire).
    assert len(slam.frame_latency_ms) >= 9


def test_pose_log_ref_kf_from_counts(seq):
    """The retire path's ref_kf (packed in counts) must equal the reference
    keyframe the device actually used — cross-checked against the map."""
    cfg = make_cfg(seq)
    slam = StereoSlam(cfg, enable_backend=False, enable_loop=False,
                      readback_lag=3)
    for t in range(16):
        assert slam.process_frame(seq.left[t], seq.right[t], seq.timestamps[t])
    slam._drain()
    n_kf = int(np.asarray(slam.map.n_kf))
    for fid, (T_rk, ref) in slam._pose_log.items():
        assert 0 <= ref < n_kf
    # The newest logged frame must reference the newest KF.
    last = max(slam._pose_log)
    assert slam._pose_log[last][1] == int(np.asarray(slam.fs.ref_kf))


def test_lagged_checkpoint_drains_inflight(tmp_path, seq):
    """Checkpoint mid-run with frames still in flight must capture a state
    that resumes identically to the uncheckpointed run (VERDICT round-1 #8:
    save under pipelining with pending async BA + non-empty _inflight)."""
    cfg = make_cfg(seq)
    a = StereoSlam(cfg, enable_backend=True, enable_loop=False, readback_lag=6)
    for t in range(20):
        assert a.process_frame(seq.left[t], seq.right[t], seq.timestamps[t])
    assert len(a._inflight) > 0  # genuinely pipelined at save time
    path = str(tmp_path / "ck.npz")
    a.save_checkpoint(path)

    b = StereoSlam(cfg, enable_backend=True, enable_loop=False, readback_lag=6)
    b.load_checkpoint(path)
    for t in range(20, 34):
        oka = a.process_frame(seq.left[t], seq.right[t], seq.timestamps[t])
        okb = b.process_frame(seq.left[t], seq.right[t], seq.timestamps[t])
        assert oka and okb
    a._drain()
    b._drain()
    assert int(a.map.n_kf) == int(b.map.n_kf)
    np.testing.assert_allclose(
        a.current_pose(), b.current_pose(), rtol=0, atol=1e-4
    )


def test_process_chunk_matches_single_frame():
    """The chunked device-resident fast path (ONE lax.scan dispatch per C
    frames) is semantically the single-frame pipeline: same keyframes, same
    poses (up to compile-order float noise), same loop-DB activity."""
    import jax
    import numpy as np

    from stereoslam_tpu.core.system import StereoSlam
    from stereoslam_tpu.utils.synthetic import generate_sequence
    from tests.test_system_vo import make_cfg

    seq = generate_sequence(n_frames=26, trajectory="forward", seed=9)
    cfg = make_cfg(seq)

    def drive_single():
        slam = StereoSlam(cfg, enable_backend=True, enable_loop=True)
        for t in range(26):
            assert slam.process_frame(seq.left[t], seq.right[t], seq.timestamps[t])
        slam._drain()
        return slam

    def drive_chunked():
        slam = StereoSlam(cfg, enable_backend=True, enable_loop=True)
        for t in range(2):  # init + first tracked frame
            assert slam.process_frame(seq.left[t], seq.right[t], seq.timestamps[t])
        for base in range(2, 26, 6):
            hi = min(base + 6, 26)
            lr = jax.device_put(
                np.stack(
                    [np.stack([seq.left[t], seq.right[t]]) for t in range(base, hi)]
                ).astype(np.uint8)
            )
            assert slam.process_chunk(lr, seq.timestamps[base:hi])
        slam._drain()
        return slam

    a, b = drive_single(), drive_chunked()
    assert int(a.map.n_kf) == int(b.map.n_kf) >= 3
    np.testing.assert_array_equal(
        np.asarray(a.map.kf_frame_id[: int(a.map.n_kf)]),
        np.asarray(b.map.kf_frame_id[: int(b.map.n_kf)]),
    )
    # Final pose parity.  The scan-compiled program fuses differently from
    # the per-frame program, and per-iteration float rounding compounds
    # through ~24 frames of LK+LM — measured ~1% of distance traveled on
    # CPU.  Structural parity (identical keyframe decisions) is the strict
    # contract; the pose bound pins "same trajectory", not bitwise equality.
    Ta, Tb = a.current_pose(), b.current_pose()
    dist = np.linalg.norm(Ta[:3, 3])
    assert np.linalg.norm(Ta[:3, 3] - Tb[:3, 3]) < max(0.02, 0.02 * dist)
    # Frame trajectory covers every frame in both modes.
    ids_a, _ = a.frame_trajectory()
    ids_b, _ = b.frame_trajectory()
    assert len(ids_a) == len(ids_b) == 26
