#!/usr/bin/env python
"""Joint speed/accuracy sweep for the r5 throughput knobs.

For each candidate config, in ONE process back-to-back:
  - chained device FPS at KITTI resolution (the binding cost per
    probe_dispatch.py: enqueue is 0.24 ms, the device chain is ~9.7 ms)
  - canonical world-circuit ATE (loop-ON, shipped thresholds) via
    stereoslam_tpu.eval.run_world_eval cfg_overrides

Writes scripts/SWEEP_SPEED.json.

Usage: python scripts/sweep_speed_accuracy.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_fps(cfg_overrides, staged, seq, n, warm):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from stereoslam_tpu.config import CameraConfig, SlamConfig
    from stereoslam_tpu.core.system import StereoSlam

    H, W = staged[0].shape[-2:]
    cfg = SlamConfig(
        camera=CameraConfig(
            fx=seq.fx, fy=seq.fy, cx=seq.cx, cy=seq.cy,
            fx_right=seq.fx, fy_right=seq.fy, cx_right=seq.cx, cy_right=seq.cy,
            bf=seq.fx * seq.baseline,
        ),
        image_height=H, image_width=W,
    )
    if cfg_overrides:
        cfg = cfg.replace(**{
            sec: dataclasses.replace(getattr(cfg, sec), **fields)
            for sec, fields in cfg_overrides.items()
        })
    slam = StereoSlam(cfg, enable_backend=True, enable_loop=True, readback_lag=4)
    for t in range(warm):
        slam.process_staged(staged[t], seq.timestamps[t])
    slam._drain()
    jax.block_until_ready(slam.fs.T_rk)
    fs, m, pyr = slam.fs, slam.map, slam._pyr_prev
    t0 = time.perf_counter()
    for t in range(warm, n):
        fs, m, pyr, packed = slam._jit_frame(
            fs, m, pyr, staged[t], jnp.float32(seq.timestamps[t])
        )
    jax.block_until_ready(packed)
    return (n - warm) / (time.perf_counter() - t0), int(m.n_kf)


def main():
    import jax

    from stereoslam_tpu import eval as EV
    from stereoslam_tpu.utils.synthetic import generate_sequence

    n = 120
    H, W = 376, 1241
    seq = generate_sequence(
        n_frames=n, h=H, w=W, fx=718.856, baseline=386.1448 / 718.856,
        n_points=4000, trajectory="forward", speed=0.8, seed=11,
    )
    staged = [
        jax.device_put(np.stack([seq.left[t], seq.right[t]]).astype(np.uint8))
        for t in range(n)
    ]
    jax.block_until_ready(staged[-1])
    warm = 12

    # Pre-render the canonical world once; reused by every eval call.
    from stereoslam_tpu.utils import world as WORLD

    wseq = WORLD.generate_world_sequence(
        n_frames=548, h=EV.WORLD_H, w=EV.WORLD_W,
        fx=320.0, seed=EV.WORLD_SEED, step=EV.WORLD_STEP,
        length=EV.WORLD_LENGTH, width=EV.WORLD_WIDTH,
    )

    BA48 = {"ba_rounds": 4, "ba_iters": 8}
    variants = [
        ("ba48", {"backend": BA48}),
        ("ba48_lv3", {"tracking": {"lk_levels": 3}, "backend": BA48}),
        ("ba48_fb8", {"tracking": {"lk_fb_iters": 8}, "backend": BA48}),
        ("ba48_lv3_fb8", {"tracking": {"lk_levels": 3, "lk_fb_iters": 8},
                          "backend": BA48}),
        ("ba38", {"backend": {"ba_rounds": 3, "ba_iters": 8}}),
        ("ba48_it18", {"tracking": {"lk_iters": 18}, "backend": BA48}),
    ]
    out = {}
    for name, ov in variants:
        fps, n_kf = chain_fps(ov, staged, seq, n, warm)
        rec = EV.run_world_eval(n_frames=548, vo_baseline=False,
                                cfg_overrides=ov, seq=wseq)
        out[name] = {
            "chain_fps": round(fps, 1), "n_kf_glide": n_kf,
            "ate_m": rec["ate_m"], "n_kf_world": rec["n_kf"],
            "loop_edges": len(rec["loop_edges"]), "lost_at": rec["lost_at"],
        }
        print(f"[{name:10s}] chain={fps:6.1f}fps ate={rec['ate_m']:.3f}m "
              f"kf={rec['n_kf']} edges={len(rec['loop_edges'])} "
              f"lost={rec['lost_at']}", flush=True)
    with open(os.path.join(os.path.dirname(__file__), "SWEEP_SPEED.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
