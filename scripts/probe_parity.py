#!/usr/bin/env python
"""Localize the CPU/TPU accuracy divergence (VERDICT r4 next-round #4).

The same code measures world ATE ~1.0 m on TPU and ~4.7 m on CPU; 548
chained frames amplify per-frame sub-pixel differences, so the comparison
must happen at per-frame granularity over a SHORT horizon before chaos
dominates.  This tool:

  run      — drive N canonical-world frames on one backend and dump every
             frame's estimated T_cw (float64) plus tracking diagnostics.
             --lk-precision highest pins the LK selection einsums to f32
             (ops/lk_batched.py _PEX), the prime suspect: every other
             matmul already runs HIGHEST (package default + schur/camera
             explicit pins).
  compare  — per-frame pose delta |log(Ta^-1 Tb)| between two dumps, with
             the frame where divergence first exceeds thresholds.

Protocol (two processes — the TPU client must run alone):
  python scripts/probe_parity.py run --backend cpu --out /tmp/p_cpu.npz
  python scripts/probe_parity.py run --backend tpu --out /tmp/p_tpu.npz
  python scripts/probe_parity.py run --backend tpu --lk-precision highest \
      --out /tmp/p_tpu_hi.npz
  python scripts/probe_parity.py compare /tmp/p_cpu.npz /tmp/p_tpu.npz
  python scripts/probe_parity.py compare /tmp/p_cpu.npz /tmp/p_tpu_hi.npz

If (cpu vs tpu_hi) deltas collapse relative to (cpu vs tpu), the divergence
lives in the LK einsum precision; otherwise keep bisecting (pose LM,
triangulation).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cmd_run(args):
    if args.lk_precision:
        os.environ["STEREOSLAM_LK_PRECISION"] = args.lk_precision
    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from stereoslam_tpu import eval as E
    from stereoslam_tpu.config import CameraConfig, SlamConfig
    from stereoslam_tpu.core.system import StereoSlam
    from stereoslam_tpu.utils import world as W

    n = args.frames
    seq = W.generate_world_sequence(
        n_frames=n, h=E.WORLD_H, w=E.WORLD_W, fx=320.0, seed=E.WORLD_SEED,
        step=E.WORLD_STEP, length=E.WORLD_LENGTH, width=E.WORLD_WIDTH,
    )
    cfg = SlamConfig(
        camera=CameraConfig(
            fx=seq.fx, fy=seq.fy, cx=seq.cx, cy=seq.cy,
            fx_right=seq.fx, fy_right=seq.fy, cx_right=seq.cx, cy_right=seq.cy,
            bf=seq.fx * seq.baseline,
        ),
        image_height=E.WORLD_H, image_width=E.WORLD_W,
    )
    # lag 0: synchronous retire so current_pose() is exact per frame.
    slam = StereoSlam(cfg, enable_backend=True, enable_loop=args.loop,
                      readback_lag=0)
    poses, inliers = [], []
    for t in range(n):
        ok = slam.process_frame(seq.left[t], seq.right[t], seq.timestamps[t])
        poses.append(np.asarray(slam.current_pose(), np.float64))
        inliers.append(slam.metrics["num_inliers"][-1]
                       if slam.metrics["num_inliers"] else -1)
        if not ok:
            break
    np.savez(args.out, poses=np.stack(poses), inliers=np.asarray(inliers),
             backend=args.backend, lk_precision=args.lk_precision or "default")
    print(f"dumped {len(poses)} poses -> {args.out}")


def cmd_compare(args):
    from stereoslam_tpu.ops import se3  # noqa: F401  (imports set precision)
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from stereoslam_tpu.ops import se3

    A = np.load(args.a, allow_pickle=True)
    B = np.load(args.b, allow_pickle=True)
    n = min(len(A["poses"]), len(B["poses"]))
    Ta, Tb = A["poses"][:n], B["poses"][:n]
    deltas = []
    for t in range(n):
        d = np.asarray(se3.log(jnp.asarray(
            (np.linalg.inv(Ta[t]) @ Tb[t]).astype(np.float32))))
        deltas.append(float(np.linalg.norm(d)))
    deltas = np.asarray(deltas)
    first_01 = int(np.argmax(deltas > 0.01)) if (deltas > 0.01).any() else -1
    first_1 = int(np.argmax(deltas > 0.1)) if (deltas > 0.1).any() else -1
    print(f"{os.path.basename(args.a)} vs {os.path.basename(args.b)}  n={n}")
    print(f"  delta p50={np.percentile(deltas,50):.5f} "
          f"p95={np.percentile(deltas,95):.5f} max={deltas.max():.5f}")
    print(f"  first>0.01 at frame {first_01}; first>0.1 at frame {first_1}")
    print("  per-decade:",
          " ".join(f"[{i*10}:{i*10+10}]={deltas[i*10:i*10+10].mean():.4f}"
                   for i in range(min(10, n // 10))))


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("run")
    r.add_argument("--backend", choices=["cpu", "tpu"], required=True)
    r.add_argument("--frames", type=int, default=60)
    r.add_argument("--loop", action="store_true")
    r.add_argument("--lk-precision", choices=["high", "highest"], default="")
    r.add_argument("--out", required=True)
    r.set_defaults(fn=cmd_run)
    c = sub.add_parser("compare")
    c.add_argument("a")
    c.add_argument("b")
    c.set_defaults(fn=cmd_compare)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
