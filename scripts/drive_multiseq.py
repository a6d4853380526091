#!/usr/bin/env python
"""Verification drive: the r5 sub-batched MultiSeqVO on the real TPU.

Prints numeric evidence: aggregate FPS + Mpx/s at B=8 (bench Phase M
semantics, kf_sub=2), per-sequence tracking health, KF counts, and the
per-step KF servicing cap holding.

Usage: python scripts/drive_multiseq.py [batch] [frames]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    import stereoslam_tpu  # noqa: F401  (sets matmul precision)
    from stereoslam_tpu.config import CameraConfig, SlamConfig
    from stereoslam_tpu.parallel.multiseq import MultiSeqVO
    from stereoslam_tpu.utils.feed import BatchFeed
    from stereoslam_tpu.utils.synthetic import generate_sequence

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 72
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
    vo = MultiSeqVO(cfg, batch=B, kf_sub=2, verify_loops=True)
    stack = lambda t, f: np.stack([getattr(s, f)[t] for s in seqs])
    n_lm = vo.initialize(stack(0, "left"), stack(0, "right"), np.zeros(B))
    print(f"init landmarks per seq: {n_lm.tolist()}", flush=True)

    warm = 16
    kf_per_step = []
    prev = np.asarray(vo.maps.n_kf).copy()
    for t in range(1, warm):
        vo.process_frames(stack(t, "left"), stack(t, "right"), np.full(B, t * 0.1))
        cur = np.asarray(vo.maps.n_kf)
        kf_per_step.append(int((cur - prev).sum()))
        prev = cur.copy()
    vo.drain()
    t0 = time.perf_counter()
    feed = BatchFeed(
        ((stack(t, "left"), stack(t, "right"), np.full(B, t * 0.1))
         for t in range(warm, n))
    )
    for lr, ts in feed:
        inl = vo.process_staged(lr, ts)
    vo.drain()
    jax.block_until_ready(vo.fs.T_rk)
    dt = time.perf_counter() - t0
    agg = B * (n - warm) / dt
    print(f"agg fps={agg:.1f}  Mpx/s={agg*240*376/1e6:.1f}  "
          f"({B} seqs x {n-warm} frames in {dt:.2f}s)", flush=True)
    print(f"kf cap per warm step (<= kf_sub=2): max={max(kf_per_step)}",
          flush=True)
    print(f"final n_kf per seq: {np.asarray(vo.maps.n_kf).tolist()}", flush=True)
    print(f"final inliers per seq: {np.asarray(inl).tolist()}", flush=True)
    print(f"alive: {vo.alive.tolist()}", flush=True)
    # ORB store really populated for post-init keyframes.
    ov = np.asarray(vo.loopdb.orb_valid)
    pops = [int(ov[b, 1:int(np.asarray(vo.maps.n_kf)[b])].sum()) for b in range(B)]
    print(f"orb rows per seq (post-init KFs): {pops}", flush=True)


if __name__ == "__main__":
    main()
