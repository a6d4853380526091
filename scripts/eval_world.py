#!/usr/bin/env python
"""Evaluation: full pipeline on the photorealistic city-circuit world at the
SHIPPED default thresholds (reference KITTI00-02.yaml:79-88 values).

This is the BASELINE.md accuracy story: the reference's own evaluation is a
saved KITTI-00 run (result/trajectory.txt, 742 KFs; result/loopEdges.txt,
17 edges).  Real KITTI imagery cannot be shipped into this environment, so
the stand-in is the ray-cast textured city circuit (utils/world.py) with
exact ground truth — run at the exact default config the package ships.

Writes results to stdout as JSON and (optionally) EVAL artifacts.

Usage:
  python scripts/eval_world.py [--frames N] [--laps K] [--out EVAL.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=0, help="0 = auto from laps")
    ap.add_argument("--laps", type=float, default=1.25)
    ap.add_argument("--h", type=int, default=240)
    ap.add_argument("--w", type=int, default=376)
    ap.add_argument("--step", type=float, default=0.8)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--out", type=str, default="")
    ap.add_argument("--traj-out", type=str, default="")
    ap.add_argument("--cache", type=str, default="",
                    help="npz path: load rendered frames if present, else render+save")
    ap.add_argument("--descriptor", type=str, default="default",
                    choices=["default", "hog", "calc"],
                    help="default = whatever the package ships")
    args = ap.parse_args()

    from stereoslam_tpu.config import CameraConfig, SlamConfig
    from stereoslam_tpu.core.system import StereoSlam
    from stereoslam_tpu.utils.metrics import ate_rmse
    from stereoslam_tpu.utils import world as W

    scene = W.make_city_circuit(90.0, 50.0, seed=args.seed)
    per_lap = W.frames_per_lap(args.step, 90.0, 50.0)
    n = args.frames or int(per_lap * args.laps)
    print(f"# perimeter {scene.perimeter:.1f} m, {per_lap} frames/lap, "
          f"{n} frames total", file=sys.stderr)

    t0 = time.time()
    cache = args.cache
    if cache and os.path.exists(cache):
        z = np.load(cache)
        if len(z["left"]) >= n:
            seq = W.WorldSequence(
                left=z["left"][:n], right=z["right"][:n], T_cw=z["T_cw"][:n],
                timestamps=z["timestamps"][:n], baseline=float(z["meta"][0]),
                fx=float(z["meta"][1]), fy=float(z["meta"][2]),
                cx=float(z["meta"][3]), cy=float(z["meta"][4]),
            )
            print(f"# loaded {n} frames from {cache}", file=sys.stderr)
        else:
            seq = None
    else:
        seq = None
    if seq is None:
        seq = W.generate_world_sequence(
            n_frames=n, h=args.h, w=args.w, seed=args.seed, step=args.step,
            scene=scene,
        )
        print(f"# rendered {n} stereo frames in {time.time()-t0:.1f}s", file=sys.stderr)
        if cache:
            np.savez_compressed(
                cache, left=seq.left, right=seq.right, T_cw=seq.T_cw,
                timestamps=seq.timestamps,
                meta=np.array([seq.baseline, seq.fx, seq.fy, seq.cx, seq.cy]),
            )

    cfg = SlamConfig(
        camera=CameraConfig(
            fx=seq.fx, fy=seq.fy, cx=seq.cx, cy=seq.cy,
            fx_right=seq.fx, fy_right=seq.fy, cx_right=seq.cx, cy_right=seq.cy,
            bf=seq.fx * seq.baseline,
        ),
        image_height=args.h,
        image_width=args.w,
    )
    # Default thresholds: assert we really are at the reference's shipped
    # operating point (KITTI00-02.yaml:79-88).
    assert cfg.loop.similarity_high == 0.94
    assert cfg.loop.similarity_low == 0.92
    assert cfg.loop.database_min_size == 50
    assert cfg.loop.id_gap == 20

    slam = StereoSlam(cfg, enable_backend=True, enable_loop=True)
    if args.descriptor == "hog":
        from stereoslam_tpu.models.calc import DescriptorModel
        slam._loop_closer.model = DescriptorModel()
    elif args.descriptor == "calc":
        from stereoslam_tpu.models.calc import DescriptorModel, load_default_params
        slam._loop_closer.model = DescriptorModel(load_default_params())

    t0 = time.time()
    lost_at = None
    for t in range(n):
        ok = slam.process_frame(seq.left[t], seq.right[t], seq.timestamps[t])
        if not ok:
            lost_at = t
            break
    slam._drain()
    wall = time.time() - t0

    fids, est = slam.frame_trajectory()
    est = est.astype(np.float64)
    gt = np.linalg.inv(seq.T_cw[fids].astype(np.float64))
    gt = np.linalg.inv(gt[0]) @ gt
    ate = float(ate_rmse(np.linalg.inv(est), gt, align=False))

    n_kf = int(slam.map.n_kf)
    edges = [(int(a), int(b)) for a, b in slam.loop_edges]

    # Loop-edge ground-truth check: matched KFs must be physically close.
    ids, _, _ = slam.keyframe_trajectory()
    fid = np.asarray(slam.map.kf_frame_id)[: len(ids)]
    edge_gt_dist = []
    for cur, loop in edges:
        g1 = np.linalg.inv(seq.T_cw[fid[cur]].astype(np.float64))[:3, 3]
        g2 = np.linalg.inv(seq.T_cw[fid[loop]].astype(np.float64))[:3, 3]
        edge_gt_dist.append(float(np.linalg.norm(g1 - g2)))

    rec = {
        "frames": len(est),
        "lost_at": lost_at,
        "ate_m": round(ate, 4),
        "n_kf": n_kf,
        "kf_rate": round(n_kf / len(est), 4),
        "loop_edges": edges,
        "edge_gt_dist_m": [round(d, 2) for d in edge_gt_dist],
        "fps": round(len(est) / wall, 2),
        "thresholds": {
            "similarity_high": cfg.loop.similarity_high,
            "similarity_low": cfg.loop.similarity_low,
            "database_min_size": cfg.loop.database_min_size,
            "id_gap": cfg.loop.id_gap,
        },
        "descriptor": args.descriptor,
    }
    print(json.dumps(rec))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=1)
    if args.traj_out:
        slam.save_trajectory(args.traj_out)


if __name__ == "__main__":
    main()
