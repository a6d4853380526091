"""End-to-end stereo VO on a synthetic sequence with exact ground truth."""

import dataclasses

import numpy as np
import pytest

from stereoslam_tpu.config import (
    CameraConfig,
    FeatureConfig,
    MapConfig,
    SlamConfig,
)
from stereoslam_tpu.core.system import StereoSlam
from stereoslam_tpu.utils.metrics import ate_rmse, rpe
from stereoslam_tpu.utils.synthetic import generate_sequence


def make_cfg(seq, max_kf=256, max_lm=20000):
    return SlamConfig(
        camera=CameraConfig(
            fx=seq.fx, fy=seq.fy, cx=seq.cx, cy=seq.cy,
            fx_right=seq.fx, fy_right=seq.fy, cx_right=seq.cx, cy_right=seq.cy,
            bf=seq.fx * seq.baseline,
        ),
        features=FeatureConfig(
            n_init_features=200, n_new_features=100, max_features=256,
            num_features_init_good=50, num_features_tracking_good=50,
            num_features_tracking_bad=10,
        ),
        map=MapConfig(max_keyframes=max_kf, max_landmarks=max_lm),
        image_height=seq.left.shape[1],
        image_width=seq.left.shape[2],
    )


@pytest.fixture(scope="module")
def forward_seq():
    return generate_sequence(n_frames=40, trajectory="forward", seed=3)


def run_vo(seq, n_frames=None, enable_backend=True):
    cfg = make_cfg(seq)
    slam = StereoSlam(cfg, enable_backend=enable_backend, enable_loop=False)
    n = n_frames or len(seq.left)
    est = []
    for t in range(n):
        ok = slam.process_frame(seq.left[t], seq.right[t], seq.timestamps[t])
        assert ok, f"tracking lost at frame {t}"
        est.append(slam.current_pose())
    return slam, np.stack(est)


def test_vo_tracks_forward_sequence(forward_seq):
    seq = forward_seq
    slam, est_T_cw = run_vo(seq, enable_backend=False)

    est_T_wc = np.linalg.inv(est_T_cw)
    gt_T_wc = np.linalg.inv(seq.T_cw.astype(np.float64))

    ate = ate_rmse(est_T_wc, gt_T_wc, align=False)
    # ~14m trajectory; no BA refinement; generous but meaningful bound.
    assert ate < 0.5, f"ATE {ate:.3f} m"
    t_rpe, r_rpe = rpe(est_T_wc, gt_T_wc)
    assert t_rpe < 0.05
    assert r_rpe < 0.01


def test_vo_with_backend_at_least_as_good(forward_seq):
    seq = forward_seq
    _, est_no_ba = run_vo(seq, enable_backend=False)
    slam, est_ba = run_vo(seq, enable_backend=True)
    gt_T_wc = np.linalg.inv(seq.T_cw.astype(np.float64))
    ate_no = ate_rmse(np.linalg.inv(est_no_ba), gt_T_wc, align=False)
    ate_ba = ate_rmse(np.linalg.inv(est_ba), gt_T_wc, align=False)
    # BA should not make things meaningfully worse.
    assert ate_ba < max(ate_no * 1.5, 0.5)
    # Keyframes were created and the map grew.
    assert int(slam.map.n_kf) >= 2
    assert int(slam.map.n_lm) > 100


def test_keyframe_trajectory_export(tmp_path, forward_seq):
    seq = forward_seq
    slam, _ = run_vo(seq, n_frames=20)
    path = tmp_path / "traj.txt"
    slam.save_trajectory(str(path))
    from stereoslam_tpu.utils.trajectory import load_trajectory

    ids, ts, T_wc = load_trajectory(str(path))
    assert len(ids) == int(slam.map.n_kf)
    assert (np.diff(ids) > 0).all()


def test_lost_on_black_frames(forward_seq):
    seq = forward_seq
    cfg = make_cfg(seq)
    slam = StereoSlam(cfg, enable_backend=False, enable_loop=False)
    black = np.zeros_like(seq.left[0])
    assert slam.process_frame(seq.left[0], seq.right[0], 0.0)  # init
    assert slam.process_frame(seq.left[1], seq.right[1], 0.1)
    ok = slam.process_frame(black, black, 0.2)
    assert not ok  # LOST, like the reference (frontend.cpp:103-108)


def test_checkpoint_resume(tmp_path, forward_seq):
    seq = forward_seq
    cfg = make_cfg(seq)
    slam = StereoSlam(cfg, enable_backend=False, enable_loop=False)
    for t in range(15):
        assert slam.process_frame(seq.left[t], seq.right[t], seq.timestamps[t])
    path = str(tmp_path / "ckpt.npz")
    slam.save_checkpoint(path)

    slam2 = StereoSlam(cfg, enable_backend=False, enable_loop=False)
    slam2.load_checkpoint(path)
    assert int(slam2.map.n_kf) == int(slam.map.n_kf)
    assert slam2.status == slam.status
    np.testing.assert_array_equal(
        np.asarray(slam2.map.lm_pos), np.asarray(slam.map.lm_pos)
    )
    # Resume tracking seamlessly: both instances agree on the next frames.
    for t in range(15, 25):
        ok1 = slam.process_frame(seq.left[t], seq.right[t], seq.timestamps[t])
        ok2 = slam2.process_frame(seq.left[t], seq.right[t], seq.timestamps[t])
        assert ok1 and ok2
    np.testing.assert_allclose(
        slam.current_pose(), slam2.current_pose(), atol=1e-5
    )
