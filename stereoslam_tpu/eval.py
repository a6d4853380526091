"""The ONE world-circuit accuracy evaluation.

Round 2 reported two contradictory accuracy stories for the same world
(bench Phase B: 2 loop edges / ATE 2.8 m; scripts/eval_world.py: 12 edges /
0.4 m) because the two harnesses drifted apart in laps/step/params
(VERDICT r2 #3-4).  This module is the single source of truth: ``bench.py``,
``scripts/eval_world.py`` and the pinned regression test all call
:func:`run_world_eval` with the same defaults, so there is exactly one
reproducible accuracy number per configuration.

The evaluation itself: drive the photorealistic ray-cast city circuit
(utils/world.py, exact ground truth) for ``laps`` laps at the SHIPPED
default thresholds (reference KITTI00-02.yaml:79-88) and report ATE,
keyframe rate, and loop edges with ground-truth separation distances —
the stand-in for the reference's saved KITTI-00 artifacts
(result/trajectory.txt, result/loopEdges.txt) in an environment where real
KITTI imagery cannot be shipped.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

# Canonical evaluation parameters — change HERE or nowhere.
WORLD_LENGTH = 90.0
WORLD_WIDTH = 50.0
WORLD_H = 240
WORLD_W = 376
WORLD_STEP = 0.8
WORLD_SEED = 1
WORLD_LAPS = 1.3


def default_world_frames(laps: float = WORLD_LAPS) -> int:
    from stereoslam_tpu.utils.world import frames_per_lap

    return int(frames_per_lap(WORLD_STEP, WORLD_LENGTH, WORLD_WIDTH) * laps)


def run_world_eval(
    n_frames: int = 0,
    laps: float = WORLD_LAPS,
    h: int = WORLD_H,
    w: int = WORLD_W,
    step: float = WORLD_STEP,
    seed: int = WORLD_SEED,
    descriptor: str = "default",
    seq=None,
    readback_lag: Optional[int] = None,
    traj_out: Optional[str] = None,
) -> dict:
    """Run the full pipeline on the world circuit at shipped defaults.

    Returns a record with frames/ate_m/n_kf/kf_rate/loop_edges/
    edge_gt_dist_m/fps/lost_at.  ``seq`` may carry a pre-rendered sequence
    (must match the parameters — callers own cache validity, see
    scripts/eval_world.py).
    """
    from stereoslam_tpu.config import CameraConfig, SlamConfig
    from stereoslam_tpu.core.system import StereoSlam
    from stereoslam_tpu.utils.feed import DeviceFeed
    from stereoslam_tpu.utils.metrics import ate_rmse
    from stereoslam_tpu.utils import world as W

    n = n_frames or int(W.frames_per_lap(step, WORLD_LENGTH, WORLD_WIDTH) * laps)
    if seq is None:
        # Focal length scales with the image width so any (h, w) sees the
        # same field of view as the canonical 240x376/fx=320 camera.
        seq = W.generate_world_sequence(
            n_frames=n, h=h, w=w, fx=320.0 * w / WORLD_W, seed=seed, step=step,
            length=WORLD_LENGTH, width=WORLD_WIDTH,
        )

    cfg = SlamConfig(
        camera=CameraConfig(
            fx=seq.fx, fy=seq.fy, cx=seq.cx, cy=seq.cy,
            fx_right=seq.fx, fy_right=seq.fy, cx_right=seq.cx, cy_right=seq.cy,
            bf=seq.fx * seq.baseline,
        ),
        image_height=h,
        image_width=w,
        # loop: SHIPPED DEFAULTS — deliberately not overridden.
    )
    assert cfg.loop.similarity_high == 0.94 and cfg.loop.id_gap == 20

    slam = StereoSlam(cfg, enable_backend=True, enable_loop=True,
                      readback_lag=readback_lag)
    if descriptor == "hog":
        from stereoslam_tpu.models.calc import DescriptorModel

        slam._loop_closer.model = DescriptorModel()
    elif descriptor not in ("default", "calc"):
        raise ValueError(f"unknown descriptor {descriptor!r}")

    t0 = time.time()
    lost_at = None
    count = 0
    feed = DeviceFeed(
        ((seq.left[t], seq.right[t], seq.timestamps[t]) for t in range(n))
    )
    for lr, ts in feed:
        if not slam.process_staged(lr, ts):
            lost_at = count
            break
        count += 1
    slam._drain()
    wall = time.time() - t0

    fids, est = slam.frame_trajectory()
    est = est.astype(np.float64)
    gt = np.linalg.inv(seq.T_cw[fids].astype(np.float64))
    gt = np.linalg.inv(gt[0]) @ gt
    ate = float(ate_rmse(np.linalg.inv(est), gt, align=False))

    n_kf = int(slam.map.n_kf)
    edges = [(int(a), int(b)) for a, b in slam.loop_edges]
    ids, _, _ = slam.keyframe_trajectory()
    fid = np.asarray(slam.map.kf_frame_id)[: len(ids)]
    edge_gt_dist = []
    for cur, loop in edges:
        g1 = np.linalg.inv(seq.T_cw[fid[cur]].astype(np.float64))[:3, 3]
        g2 = np.linalg.inv(seq.T_cw[fid[loop]].astype(np.float64))[:3, 3]
        edge_gt_dist.append(float(np.linalg.norm(g1 - g2)))

    if traj_out:
        slam.save_trajectory(traj_out)
    lat = np.asarray(slam.frame_latency_ms) if slam.frame_latency_ms else np.zeros(1)
    return {
        "frames": len(est),
        "lost_at": lost_at,
        "ate_m": round(ate, 4),
        "n_kf": n_kf,
        "kf_rate": round(n_kf / max(len(est), 1), 4),
        "loop_edges": edges,
        "edge_gt_dist_m": [round(d, 2) for d in edge_gt_dist],
        "fps": round(len(est) / wall, 2) if wall > 0 else 0.0,
        "latency_ms_p50": round(float(np.percentile(lat, 50)), 2),
        "params": {"h": h, "w": w, "step": step, "seed": seed, "frames": n,
                   "descriptor": descriptor},
        "thresholds": {
            "similarity_high": cfg.loop.similarity_high,
            "similarity_low": cfg.loop.similarity_low,
            "database_min_size": cfg.loop.database_min_size,
            "id_gap": cfg.loop.id_gap,
        },
    }
