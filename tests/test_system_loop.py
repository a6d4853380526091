"""End-to-end loop closing on a circular synthetic sequence.

This exercises the loop-closing *machinery* (detect/verify/correct/PGO) on
the fast blob-world with the deterministic HOG descriptor pinned and
thresholds tuned to its similarity scale.  The shipped operating point —
trained CALC descriptor at the reference's default thresholds
(KITTI00-02.yaml:79-88) — is covered end-to-end by test_world_loop.py.
"""

import dataclasses

import numpy as np
import pytest

from stereoslam_tpu.config import LoopClosingConfig
from stereoslam_tpu.core.system import StereoSlam
from stereoslam_tpu.models.calc import DescriptorModel
from stereoslam_tpu.utils.metrics import ate_rmse
from stereoslam_tpu.utils.synthetic import generate_sequence
from tests.test_system_vo import make_cfg


@pytest.fixture(scope="module")
def loop_seq():
    # ~42 m circuit returning exactly to the start view.
    return generate_sequence(
        n_frames=150, loop_frames=120, trajectory="loop", speed=0.35, seed=7,
        n_points=900,
    )


def loop_cfg(seq):
    cfg = make_cfg(seq)
    return cfg.replace(
        loop=LoopClosingConfig(
            similarity_high=0.93,
            similarity_low=0.92,
            max_above_low=6,
            database_min_size=5,
            id_gap=10,
            min_matches=10,
            min_inliers=10,
            correction_threshold=0.5,
        ),
        # The sparse-blob micro-world is texture-starved (few features,
        # each load-bearing): it needs the reference's 4-level pyramid
        # (maxLevel=3, frontend.cpp:150), the same way this cfg already
        # pins blob-tuned similarity thresholds.  The shipped 3-level
        # default is calibrated on textured imagery (7-seed photoreal
        # ensemble, scripts/SWEEP_SEEDS_AB.json).
        tracking=dataclasses.replace(cfg.tracking, lk_levels=4),
    )


def test_loop_detected_and_corrected(loop_seq):
    seq = loop_seq
    cfg = loop_cfg(seq)
    slam = StereoSlam(cfg, enable_backend=True, enable_loop=True,
                      descriptor_model=DescriptorModel())
    est = []
    for t in range(len(seq.left)):
        ok = slam.process_frame(seq.left[t], seq.right[t], seq.timestamps[t])
        assert ok, f"tracking lost at frame {t}"
        est.append(slam.current_pose())
    est = np.stack(est).astype(np.float64)

    # The circuit closes: at least one loop edge must be found, joining a
    # late KF to an early one.
    assert len(slam.loop_edges) >= 1, "no loop closure detected"
    cur, loop = slam.loop_edges[0]
    assert cur - loop >= cfg.loop.id_gap

    # The matched pair must be physically close (ground truth).
    ids, ts, T_kf = slam.keyframe_trajectory()
    fid = np.asarray(slam.map.kf_frame_id)[: len(ids)]
    gt_cur = np.linalg.inv(seq.T_cw[fid[cur]].astype(np.float64))[:3, 3]
    gt_loop = np.linalg.inv(seq.T_cw[fid[loop]].astype(np.float64))[:3, 3]
    assert np.linalg.norm(gt_cur - gt_loop) < 4.0

    # Trajectory quality after correction.
    gt = np.linalg.inv(seq.T_cw.astype(np.float64))
    ate = ate_rmse(np.linalg.inv(est), gt, align=False)
    assert ate < 1.0, f"ATE {ate:.3f} m"


def test_loop_edges_export(tmp_path, loop_seq):
    seq = loop_seq
    cfg = loop_cfg(seq)
    slam = StereoSlam(cfg, enable_backend=True, enable_loop=True,
                      descriptor_model=DescriptorModel())
    for t in range(len(seq.left)):
        assert slam.process_frame(seq.left[t], seq.right[t], seq.timestamps[t])
    if not slam.loop_edges:
        pytest.skip("no loop found in this configuration")
    path = tmp_path / "loopEdges.txt"
    slam.save_loop_edges(str(path))
    lines = open(path).read().strip().splitlines()
    # Reference format: two pose lines per loop edge (system.cpp:203-220).
    assert len(lines) == 2 * len(slam.loop_edges)
    assert all(len(l.split()) == 9 for l in lines)
