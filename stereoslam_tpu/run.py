"""CLI driver: run stereo SLAM on a KITTI sequence.

The TPU-native counterpart of the reference app
(reference app/run_kitti_stereo.cpp:30-105: ``run_kitti_stereo config.yaml
sequence_dir`` — per-frame loop with timing, progress prints every 100
frames, trajectory + loop-edge dumps, average FPS report)::

    python -m stereoslam_tpu.run CONFIG SEQUENCE_DIR [--output DIR]
                                 [--max-frames N] [--no-loop] [--no-backend]
"""

from __future__ import annotations

import argparse
import logging
import os
import time


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("config", help="reference-style OpenCV YAML config")
    parser.add_argument("sequence_dir", help="KITTI sequence dir (times.txt, image_0/, image_1/)")
    parser.add_argument("--output", default="result", help="output directory")
    parser.add_argument("--max-frames", type=int, default=0)
    parser.add_argument("--no-loop", action="store_true")
    parser.add_argument("--no-backend", action="store_true")
    parser.add_argument("--gt", default="", help="optional KITTI gt poses file for ATE report")
    parser.add_argument(
        "--plot-every",
        type=int,
        default=0,
        metavar="N",
        help="write an incremental trajectory/map plot to OUTPUT/live.png "
        "every N frames (the Viewer role, reference viewer.cpp:35-101 — but "
        "off the frame loop: rendering happens between frames, never blocks "
        "the device stream, and costs nothing when 0/off)",
    )
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(name)s: %(message)s")
    log = logging.getLogger("run")

    from stereoslam_tpu.config import load_config
    from stereoslam_tpu.core.system import StereoSlam
    from stereoslam_tpu.utils import kitti

    cfg = load_config(args.config)
    slam = StereoSlam(cfg, enable_backend=not args.no_backend, enable_loop=not args.no_loop)

    os.makedirs(args.output, exist_ok=True)
    live = None
    if args.plot_every > 0:
        from stereoslam_tpu.utils.viewer import LiveView

        live = LiveView(args.output)
    t0 = time.time()
    n = 0
    # Stream through the device feed: frame t+1's stereo pair uploads while
    # frame t computes (utils/feed.py) — the transfer never sits on the
    # frame loop's critical path.
    from stereoslam_tpu.utils.feed import DeviceFeed

    def _host_frames():
        for i, (left, right, ts) in enumerate(kitti.frames(args.sequence_dir)):
            if args.max_frames and i >= args.max_frames:
                return
            if live is not None:
                _host_frames.last = left
            yield left, right, ts

    for lr, ts in DeviceFeed(_host_frames()):
        ok = slam.process_staged(lr, ts)
        n += 1
        if n % 100 == 0:
            log.info("frame %d (%.1f FPS)", n, n / (time.time() - t0))
        if live is not None and n % args.plot_every == 0:
            live.update(slam, getattr(_host_frames, "last", None))
        if not ok:
            log.warning("tracking lost — stopping (reference behavior)")
            break
    dt = time.time() - t0
    log.info("processed %d frames in %.1fs (%.1f FPS avg)", n, dt, n / dt)

    traj_path = os.path.join(args.output, "trajectory.txt")
    edges_path = os.path.join(args.output, "loopEdges.txt")
    slam.save_trajectory(traj_path)
    slam.save_loop_edges(edges_path)
    log.info("saved %s (+ %d loop edges in %s)", traj_path, len(slam.loop_edges), edges_path)

    # Final 3D map scene + PLY export (the reference Pangolin viewer's 3D
    # content, viewer.cpp:249-267, rendered offline).
    try:
        import numpy as np

        from stereoslam_tpu.utils.viewer import export_ply, plot_map_3d

        _, _, T_cw = slam.keyframe_trajectory()
        lm_pos = np.asarray(slam.map.lm_pos)
        lm_ok = np.asarray(slam.map.lm_valid) & ~np.asarray(slam.map.lm_outlier)
        plot_map_3d(T_cw, lm_pos, lm_ok, slam.loop_edges,
                    out_path=os.path.join(args.output, "map3d.png"))
        export_ply(T_cw, lm_pos, lm_ok, slam.loop_edges,
                   out_path=os.path.join(args.output, "map.ply"))
        log.info("saved 3D map scene (map3d.png, map.ply)")
    except Exception as e:  # visualization must never fail the run
        log.warning("3D map export failed: %s", e)

    if args.gt:
        import numpy as np

        from stereoslam_tpu.utils.metrics import ate_rmse

        gt_all = kitti.load_gt_poses(args.gt)
        ids, _, T_cw = slam.keyframe_trajectory()
        fid = np.asarray(slam.map.kf_frame_id)[: len(ids)]
        est_T_wc = np.linalg.inv(T_cw.astype(np.float64))
        ate = ate_rmse(est_T_wc, gt_all[fid], align=True)
        log.info("ATE RMSE vs ground truth: %.3f m over %d keyframes", ate, len(ids))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
