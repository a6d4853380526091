#!/usr/bin/env python
"""Decompose the per-frame cost of the full pipeline on the real chip.

Round-5 question (VERDICT r4 next-round #1): where do the ~11.5 ms/frame go?
Candidate sinks, each measured separately here, in ONE process back-to-back
(tunnel variance makes cross-process comparison meaningless):

  E  host enqueue cost per _jit_frame call (chained state handles, no
     retire, no readback — per-call wall time while the device runs ahead)
  D  device chain throughput (same chain, total wall / N after final sync)
  D0 device chain throughput with the KF branch never taken (kf interval
     forced huge) — isolates the amortized cost of KF frames
  R  retire cost (np.asarray of the packed outcome + host bookkeeping)
  P  cProfile of the steady-state loop (where Python time actually goes)

Usage: python scripts/probe_dispatch.py [n_frames]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(seq, H, W, kf_never=False, lag=4):
    from stereoslam_tpu.config import CameraConfig, SlamConfig, TrackingConfig
    from stereoslam_tpu.core.system import StereoSlam

    kw = {}
    if kf_never:
        # Disable the motion-clock KF trigger; weak-tracking KFs may still
        # fire (reported via n_kf) but on the Phase-A glide they are rare.
        kw = dict(tracking=TrackingConfig(kf_max_interval=0))
    cfg = SlamConfig(
        camera=CameraConfig(
            fx=seq.fx, fy=seq.fy, cx=seq.cx, cy=seq.cy,
            fx_right=seq.fx, fy_right=seq.fy, cx_right=seq.cx, cy_right=seq.cy,
            bf=seq.fx * seq.baseline,
        ),
        image_height=H, image_width=W, **kw,
    )
    return StereoSlam(cfg, enable_backend=True, enable_loop=not kf_never,
                      readback_lag=lag)


def main():
    import jax

    from stereoslam_tpu.utils.synthetic import generate_sequence

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
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

    # ---- E + D: enqueue cost and device chain throughput -------------------
    slam = build(seq, H, W)
    for t in range(warm):
        slam.process_staged(staged[t], seq.timestamps[t])
    slam._drain()
    jax.block_until_ready(slam.fs.T_rk)

    import jax.numpy as jnp

    fs, m, pyr = slam.fs, slam.map, slam._pyr_prev
    per_call = []
    t_all0 = time.perf_counter()
    for t in range(warm, n):
        t0 = time.perf_counter()
        fs, m, pyr, packed = slam._jit_frame(
            fs, m, pyr, staged[t], jnp.float32(seq.timestamps[t])
        )
        per_call.append(time.perf_counter() - t0)
    t_enq_done = time.perf_counter()
    jax.block_until_ready(packed)
    t_sync_done = time.perf_counter()
    N = n - warm
    E = np.asarray(per_call) * 1e3
    print(f"[E] enqueue/call ms: p50={np.percentile(E,50):.2f} "
          f"p95={np.percentile(E,95):.2f} mean={E.mean():.2f} "
          f"(enqueue loop total {1e3*(t_enq_done-t_all0):.0f} ms for {N})")
    print(f"[D] chain wall/frame ms: {1e3*(t_sync_done-t_all0)/N:.2f} "
          f"(sync tail {1e3*(t_sync_done-t_enq_done):.0f} ms) "
          f"-> chain fps={N/(t_sync_done-t_all0):.1f}")

    # ---- ts variant: pre-staged device timestamps --------------------------
    ts_dev = [jax.device_put(np.float32(seq.timestamps[t])) for t in range(n)]
    jax.block_until_ready(ts_dev[-1])
    fs, m, pyr = slam.fs, slam.map, slam._pyr_prev
    per_call = []
    t_all0 = time.perf_counter()
    for t in range(warm, n):
        t0 = time.perf_counter()
        fs, m, pyr, packed = slam._jit_frame(fs, m, pyr, staged[t], ts_dev[t])
        per_call.append(time.perf_counter() - t0)
    jax.block_until_ready(packed)
    t_sync_done = time.perf_counter()
    E2 = np.asarray(per_call) * 1e3
    print(f"[E2] enqueue/call ms (device ts): p50={np.percentile(E2,50):.2f} "
          f"mean={E2.mean():.2f} -> chain fps={N/(t_sync_done-t_all0):.1f}")

    # ---- D0: KF branch never taken ----------------------------------------
    slam0 = build(seq, H, W, kf_never=True)
    for t in range(warm):
        slam0.process_staged(staged[t], seq.timestamps[t])
    slam0._drain()
    jax.block_until_ready(slam0.fs.T_rk)
    fs, m, pyr = slam0.fs, slam0.map, slam0._pyr_prev
    t_all0 = time.perf_counter()
    for t in range(warm, n):
        fs, m, pyr, packed = slam0._jit_frame(
            fs, m, pyr, staged[t], jnp.float32(seq.timestamps[t])
        )
    jax.block_until_ready(packed)
    dt = time.perf_counter() - t_all0
    print(f"[D0] no-KF chain wall/frame ms: {1e3*dt/N:.2f} "
          f"-> fps={N/dt:.1f} (n_kf={int(m.n_kf)})")

    # ---- R: full loop (process_staged incl. retire) + cProfile -------------
    slam2 = build(seq, H, W)
    for t in range(warm):
        slam2.process_staged(staged[t], seq.timestamps[t])
    slam2._drain()
    jax.block_until_ready(slam2.fs.T_rk)
    t0 = time.perf_counter()
    for t in range(warm, n):
        slam2.process_staged(staged[t], seq.timestamps[t])
    slam2._drain()
    jax.block_until_ready(slam2.fs.T_rk)
    dt = time.perf_counter() - t0
    print(f"[R] full process_staged loop: {1e3*dt/N:.2f} ms/frame "
          f"-> fps={N/dt:.1f} (vs chain-only above; diff = retire+bookkeeping)")

    import cProfile
    import pstats

    slam3 = build(seq, H, W)
    for t in range(warm):
        slam3.process_staged(staged[t], seq.timestamps[t])
    slam3._drain()
    jax.block_until_ready(slam3.fs.T_rk)
    prof = cProfile.Profile()
    prof.enable()
    for t in range(warm, n):
        slam3.process_staged(staged[t], seq.timestamps[t])
    prof.disable()
    jax.block_until_ready(slam3.fs.T_rk)
    stats = pstats.Stats(prof)
    stats.sort_stats("cumulative")
    print("[P] top cumulative in steady-state loop:")
    stats.print_stats(18)


if __name__ == "__main__":
    main()
