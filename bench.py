#!/usr/bin/env python
"""Benchmark: full SLAM pipeline throughput on KITTI-resolution frames.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's ~50 FPS full pipeline (viewer off) on its i5-8265U
(reference README.md:98; see BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    # Watchdog: if the device is wedged (seen once: a dead client holding the
    # TPU grant makes every claim hang), emit a diagnostic record instead of
    # hanging the whole round.
    import signal

    def _on_timeout(signum, frame):
        print(
            json.dumps(
                {
                    "metric": "full_pipeline_fps_kitti_res",
                    "value": 0.0,
                    "unit": "frames/s",
                    "vs_baseline": 0.0,
                    "error": "watchdog: device unresponsive",
                }
            ),
            flush=True,
        )
        os._exit(2)

    signal.signal(signal.SIGALRM, _on_timeout)
    signal.alarm(int(os.environ.get("BENCH_WATCHDOG_S", "3300")))

    t_setup = time.time()
    import jax

    from stereoslam_tpu.config import (
        CameraConfig,
        FeatureConfig,
        MapConfig,
        SlamConfig,
    )
    from stereoslam_tpu.core.system import StereoSlam
    from stereoslam_tpu.utils.synthetic import generate_sequence

    n_frames = int(os.environ.get("BENCH_FRAMES", "60"))
    warmup = 8

    # KITTI 00 geometry: 1241x376, fx=718.856, baseline*fx=386.1448.
    seq = generate_sequence(
        n_frames=n_frames,
        h=376,
        w=1241,
        fx=718.856,
        baseline=386.1448 / 718.856,
        n_points=4000,
        trajectory="forward",
        speed=0.8,
        seed=11,
    )
    cfg = SlamConfig(
        camera=CameraConfig(
            fx=seq.fx, fy=seq.fy, cx=seq.cx, cy=seq.cy,
            fx_right=seq.fx, fy_right=seq.fy, cx_right=seq.cx, cy_right=seq.cy,
            bf=seq.fx * seq.baseline,
        ),
        features=FeatureConfig(),
        map=MapConfig(),
        image_height=376,
        image_width=1241,
    )
    slam = StereoSlam(cfg, enable_backend=True, enable_loop=True)

    # Warmup (compilation) until the tracking AND keyframe paths have both
    # compiled (stereo-init + track + make-KF + BA + loop-process).
    t = 0
    for t in range(n_frames // 2):
        ok = slam.process_frame(seq.left[t], seq.right[t], seq.timestamps[t])
        if not ok:
            break
        if t + 1 >= warmup and int(slam.map.n_kf) >= 2:
            break
    warmup = t + 1

    t0 = time.time()
    frames = 0
    for t in range(warmup, n_frames):
        ok = slam.process_frame(seq.left[t], seq.right[t], seq.timestamps[t])
        frames += 1
        if not ok:
            break
    jax.block_until_ready(slam.fs.T_rk)
    dt = time.time() - t0

    fps = frames / dt if dt > 0 else 0.0
    print(
        json.dumps(
            {
                "metric": "full_pipeline_fps_kitti_res",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 50.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
