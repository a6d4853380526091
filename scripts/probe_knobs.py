#!/usr/bin/env python
"""A/B the chained device cost of the full pipeline under config knob cuts.

All variants run in ONE process back-to-back (tunnel variance makes
cross-process FPS comparison meaningless).  Each variant: build a system,
warm both branches, then run the state-chained enqueue loop (no retire) and
sync once — the pure device chain throughput, which probe_dispatch.py showed
is the binding cost (~9.7 ms/frame vs 0.24 ms enqueue).

Usage: python scripts/probe_knobs.py [n_frames]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_fps(cfg, staged, seq, n, warm, enable_loop=True):
    import jax
    import jax.numpy as jnp

    from stereoslam_tpu.core.system import StereoSlam

    slam = StereoSlam(cfg, enable_backend=True, enable_loop=enable_loop,
                      readback_lag=4)
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
    dt = time.perf_counter() - t0
    return (n - warm) / dt, int(m.n_kf)


def main():
    import jax

    from stereoslam_tpu.config import (
        BackendConfig, CameraConfig, SlamConfig, TrackingConfig,
    )
    from stereoslam_tpu.utils.synthetic import generate_sequence

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 120
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

    def cam():
        return CameraConfig(
            fx=seq.fx, fy=seq.fy, cx=seq.cx, cy=seq.cy,
            fx_right=seq.fx, fy_right=seq.fy, cx_right=seq.cx, cy_right=seq.cy,
            bf=seq.fx * seq.baseline,
        )

    variants = [
        ("baseline", SlamConfig(camera=cam(), image_height=H, image_width=W),
         dict()),
        ("no_loop", SlamConfig(camera=cam(), image_height=H, image_width=W),
         dict(enable_loop=False)),
        ("lk_iters12", SlamConfig(
            camera=cam(), image_height=H, image_width=W,
            tracking=TrackingConfig(lk_iters=12)), dict()),
        ("lk_levels3", SlamConfig(
            camera=cam(), image_height=H, image_width=W,
            tracking=TrackingConfig(lk_levels=3)), dict()),
        ("ba_3r6i", SlamConfig(
            camera=cam(), image_height=H, image_width=W,
            backend=BackendConfig(ba_rounds=3, ba_iters=6)), dict()),
        ("no_fb", SlamConfig(
            camera=cam(), image_height=H, image_width=W,
            tracking=TrackingConfig(lk_forward_backward=0.0)), dict()),
        ("baseline2", SlamConfig(camera=cam(), image_height=H, image_width=W),
         dict()),
    ]
    for name, cfg, kw in variants:
        fps, n_kf = chain_fps(cfg, staged, seq, n, warm, **kw)
        print(f"[{name:12s}] chain fps={fps:6.1f}  ms/frame={1e3/fps:5.2f}  "
              f"n_kf={n_kf}", flush=True)


if __name__ == "__main__":
    main()
