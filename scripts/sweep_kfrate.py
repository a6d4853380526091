#!/usr/bin/env python
"""KF-rate / ATE trade study (VERDICT r4 next-round #6).

Round 4 claimed "pushing the motion clock to reach a 0.18 KF rate measured
2.5x worse ATE" as README prose with no artifact.  This script pins the
experiment: canonical world runs across kf_max_interval settings, recording
keyframe rate vs ATE (reference KITTI-00 rate: 742/4541 = 0.163,
result/trajectory.txt).

Writes scripts/KFRATE_TRADE.json.

Usage: python scripts/sweep_kfrate.py [n_seeds]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from stereoslam_tpu import eval as E

    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out = {"reference_kf_rate": round(742 / 4541, 4), "settings": {}}
    for interval in (6, 7, 8, 9):
        rows = []
        for s in range(1, 1 + n_seeds):
            rec = E.run_world_eval(
                n_frames=548, seed=s, vo_baseline=False,
                cfg_overrides={"tracking": {"kf_max_interval": interval}},
            )
            rows.append({"seed": s, "ate_m": rec["ate_m"],
                         "kf_rate": rec["kf_rate"],
                         "edges": len(rec["loop_edges"]),
                         "lost_at": rec["lost_at"]})
            print(f"[interval {interval} seed {s}] rate={rec['kf_rate']:.3f} "
                  f"ate={rec['ate_m']:.3f} lost={rec['lost_at']}", flush=True)
        ates = [r["ate_m"] for r in rows if r["lost_at"] is None]
        out["settings"][str(interval)] = {
            "rows": rows,
            "kf_rate_mean": round(float(np.mean([r["kf_rate"] for r in rows])), 4),
            "ate_mean": round(float(np.mean(ates)), 3) if ates else None,
            "n_lost": sum(1 for r in rows if r["lost_at"] is not None),
        }
    with open(os.path.join(os.path.dirname(__file__), "KFRATE_TRADE.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk != "rows"}
                      if isinstance(v, dict) else v
                      for k, v in out["settings"].items()}))


if __name__ == "__main__":
    main()
