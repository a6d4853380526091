#!/usr/bin/env python
"""Evaluation CLI: full pipeline on the photorealistic city-circuit world at
the SHIPPED default thresholds (reference KITTI00-02.yaml:79-88 values).

This is a thin CLI over :mod:`stereoslam_tpu.eval` — the SAME function
``bench.py`` Phase B and the pinned regression test run, so there is exactly
one accuracy number per configuration (VERDICT r2 #4).  The reference's own
evaluation is a saved KITTI-00 run (result/trajectory.txt, 742 KFs;
result/loopEdges.txt, 17 edges); real KITTI imagery cannot be shipped here,
so the stand-in is the ray-cast textured city circuit with exact GT.

Usage:
  python scripts/eval_world.py [--frames N] [--laps K] [--out EVAL.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from stereoslam_tpu import eval as E

    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=0, help="0 = auto from laps")
    ap.add_argument("--laps", type=float, default=E.WORLD_LAPS)
    ap.add_argument("--h", type=int, default=E.WORLD_H)
    ap.add_argument("--w", type=int, default=E.WORLD_W)
    ap.add_argument("--step", type=float, default=E.WORLD_STEP)
    ap.add_argument("--seed", type=int, default=E.WORLD_SEED)
    ap.add_argument("--out", type=str, default="")
    ap.add_argument("--traj-out", type=str, default="")
    ap.add_argument("--cache", type=str, default="",
                    help="npz path: load rendered frames if present, else render+save")
    ap.add_argument("--descriptor", type=str, default="default",
                    choices=["default", "hog", "calc"],
                    help="default = whatever the package ships")
    args = ap.parse_args()

    from stereoslam_tpu.utils import world as W

    per_lap = W.frames_per_lap(args.step, E.WORLD_LENGTH, E.WORLD_WIDTH)
    n = args.frames or int(per_lap * args.laps)
    print(f"# {per_lap} frames/lap, {n} frames total", file=sys.stderr)

    # Optional frame cache.  Render parameters are part of the cache
    # identity: a cache produced at different h/w/seed/step would silently
    # evaluate the wrong imagery against the requested ground truth.
    t0 = time.time()
    # fx scales with --w so any width sees the canonical FOV (same rule as
    # run_world_eval's internal render path); fx is part of the cache
    # identity so a cache from another width cannot be silently reused
    # (ADVICE r3 #2).
    fx = 320.0 * args.w / E.WORLD_W
    render_meta = np.array([args.h, args.w, args.seed, args.step, fx], np.float64)
    seq = None
    if args.cache and os.path.exists(args.cache):
        z = np.load(args.cache)
        if (
            len(z["left"]) >= n
            and "render_meta" in z
            and np.array_equal(z["render_meta"], render_meta)
        ):
            seq = W.WorldSequence(
                left=z["left"][:n], right=z["right"][:n], T_cw=z["T_cw"][:n],
                timestamps=z["timestamps"][:n], baseline=float(z["meta"][0]),
                fx=float(z["meta"][1]), fy=float(z["meta"][2]),
                cx=float(z["meta"][3]), cy=float(z["meta"][4]),
            )
            print(f"# loaded {n} frames from {args.cache}", file=sys.stderr)
        else:
            print(f"# cache {args.cache} stale (size/params mismatch); re-rendering",
                  file=sys.stderr)
    if seq is None:
        seq = W.generate_world_sequence(
            n_frames=n, h=args.h, w=args.w, fx=fx, seed=args.seed,
            step=args.step, length=E.WORLD_LENGTH, width=E.WORLD_WIDTH,
        )
        print(f"# rendered {n} stereo frames in {time.time()-t0:.1f}s",
              file=sys.stderr)
        if args.cache:
            np.savez_compressed(
                args.cache, left=seq.left, right=seq.right, T_cw=seq.T_cw,
                timestamps=seq.timestamps,
                meta=np.array([seq.baseline, seq.fx, seq.fy, seq.cx, seq.cy]),
                render_meta=render_meta,
            )

    rec = E.run_world_eval(
        n_frames=n, h=args.h, w=args.w, step=args.step, seed=args.seed,
        descriptor=args.descriptor, seq=seq,
        traj_out=args.traj_out or None,
    )
    print(json.dumps(rec))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
