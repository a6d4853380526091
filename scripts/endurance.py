#!/usr/bin/env python
"""Reference-scale endurance run (VERDICT r4 next-round #3).

Drives ~11 laps of the canonical world circuit (~4,550 frames — the
reference's KITTI-00 artifacts cover 4,541) through the full pipeline and
pins the record to ENDURANCE.json: ATE, ~850 keyframes, repeated loop
closures, live landmark compaction, and start-vs-end stage timings showing
the O(K) work (DB scan, pose graph) stays amortized.

Usage:
  python scripts/endurance.py [--laps K] [--out ENDURANCE.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from stereoslam_tpu import eval as E

    ap = argparse.ArgumentParser()
    ap.add_argument("--laps", type=float, default=E.ENDURANCE_LAPS)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ENDURANCE.json"))
    args = ap.parse_args()

    rec = E.run_endurance(laps=args.laps)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({k: rec[k] for k in (
        "frames", "lost_at", "ate_m", "n_kf", "true_revisit_edges",
        "compactions", "fps", "frame_ms_p50_first800", "frame_ms_p50_last800",
        "db_scan_ms_final", "pgo_ms_final_fullgraph")}))


if __name__ == "__main__":
    main()
