#!/usr/bin/env python
"""Multi-seed world-circuit robustness sweep (VERDICT r3 next-round #5).

Runs the canonical world evaluation at a chosen resolution over N seeds and
reports per-seed ATE / LOST status / loop-edge counts, plus the max-ATE
summary the regression test pins.  The round-3 low-res (120x188) runs were
"run-to-run chaotic" (corner-entry bistability); this harness is the
instrument for driving that to deterministic-grade.

Usage:
  python scripts/sweep_world.py [--h 120 --w 188] [--seeds 10] [--laps 1.3]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import sys


def main():
    from stereoslam_tpu import eval as E

    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=120)
    ap.add_argument("--w", type=int, default=188)
    ap.add_argument("--seeds", type=int, default=10)
    ap.add_argument("--seed0", type=int, default=1)
    ap.add_argument("--laps", type=float, default=E.WORLD_LAPS)
    ap.add_argument("--frames", type=int, default=0)
    ap.add_argument("--out", type=str, default="")
    args = ap.parse_args()

    records = []
    for s in range(args.seed0, args.seed0 + args.seeds):
        rec = E.run_world_eval(
            n_frames=args.frames, laps=args.laps, h=args.h, w=args.w,
            seed=s, vo_baseline=False,
        )
        row = {
            "seed": s,
            "ate_m": rec["ate_m"],
            "lost_at": rec["lost_at"],
            "frames": rec["frames"],
            "n_kf": rec["n_kf"],
            "loop_edges": len(rec["loop_edges"]),
        }
        records.append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)

    ates = [r["ate_m"] for r in records if r["lost_at"] is None]
    summary = {
        "h": args.h, "w": args.w, "seeds": args.seeds,
        "n_lost": sum(1 for r in records if r["lost_at"] is not None),
        "ate_max": max(ates) if ates else None,
        "ate_mean": round(sum(ates) / len(ates), 4) if ates else None,
        "records": records,
    }
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
