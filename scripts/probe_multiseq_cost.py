#!/usr/bin/env python
"""Decompose the batched multiseq per-step device cost (one TPU process).

Hypothesis: under vmap the frontend's device-side lax.cond branches (rescue
LK, mid-stream replenish) lower to select — BOTH branches execute for every
sequence every step, so the batched tracking step pays ~3x the LK work the
single-sequence path pays.

Variants (chained enqueue, sync once):
  full        — shipped MultiSeqVO defaults
  no_hoist    — lk_retry_fail_frac=0, replenish disabled (conds never built)
  no_backend  — + BA off
  no_loop     — + detection/CALC/ORB off

Usage: python scripts/probe_multiseq_cost.py [batch] [frames]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_variant(name, cfg, kw, seqs, n, warm):
    import jax

    from stereoslam_tpu.parallel.multiseq import MultiSeqVO

    B = len(seqs)
    vo = MultiSeqVO(cfg, batch=B, **kw)
    stack = lambda t, f: np.stack([getattr(s, f)[t] for s in seqs])
    vo.initialize(stack(0, "left"), stack(0, "right"), np.zeros(B))
    staged = []
    for t in range(1, n):
        staged.append((vo._put(np.stack([stack(t, "left"), stack(t, "right")],
                                        axis=1).astype(np.uint8)),
                       np.full(B, t * 0.1)))
    jax.block_until_ready(staged[-1][0])
    for t in range(warm):
        vo.process_staged(*staged[t])
    vo.drain()
    jax.block_until_ready(vo.fs.T_rk)
    t0 = time.perf_counter()
    for t in range(warm, n - 1):
        vo.process_staged(*staged[t])
    vo.drain()
    jax.block_until_ready(vo.fs.T_rk)
    dt = time.perf_counter() - t0
    steps = n - 1 - warm
    print(f"[{name:10s}] {1e3*dt/steps:6.1f} ms/step  agg fps={B*steps/dt:6.1f} "
          f"Mpx/s={B*steps/dt*240*376/1e6:5.1f}  n_kf={np.asarray(vo.maps.n_kf).tolist()}",
          flush=True)


def main():
    import dataclasses

    from stereoslam_tpu.config import CameraConfig, SlamConfig, TrackingConfig
    from stereoslam_tpu.utils.synthetic import generate_sequence

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    seqs = [
        generate_sequence(n_frames=n, h=240, w=376, fx=320.0, baseline=0.54,
                          n_points=2000, trajectory="forward", speed=0.6,
                          seed=20 + b)
        for b in range(B)
    ]
    cfg = SlamConfig(
        camera=CameraConfig(
            fx=320.0, fy=320.0, cx=188.0, cy=120.0,
            fx_right=320.0, fy_right=320.0, cx_right=188.0, cy_right=120.0,
            bf=320.0 * 0.54,
        ),
        image_height=240, image_width=376,
    )
    nh = cfg.replace(tracking=dataclasses.replace(
        cfg.tracking, lk_retry_fail_frac=0.0, replenish_min_inliers=0))
    warm = 14
    run_variant("full", cfg, dict(kf_sub=2, verify_loops=True), seqs, n, warm)
    run_variant("no_hoist", nh, dict(kf_sub=2, verify_loops=True), seqs, n, warm)
    run_variant("no_backend", nh, dict(kf_sub=2, verify_loops=True,
                                       enable_backend=False), seqs, n, warm)
    run_variant("no_loop", nh, dict(kf_sub=2, enable_backend=False,
                                    enable_loop=False), seqs, n, warm)


if __name__ == "__main__":
    main()
