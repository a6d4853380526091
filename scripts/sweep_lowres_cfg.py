#!/usr/bin/env python
"""Half-resolution (120x188) config search (VERDICT r4 next-round #5).

The automatic resolution scaling fixed cell/border/disparity but the first
r5 sweep still measured ATE ~10 m with a 0.7 keyframe rate — inliers hover
at the 50-feature GOOD threshold, so weak-tracking keyframes fire
constantly.  This sweep varies the remaining candidates (LK window size,
status thresholds) over a 3-seed ensemble each.

Writes scripts/SWEEP_LOWRES_CFG.json.

Usage: python scripts/sweep_lowres_cfg.py [n_seeds]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from stereoslam_tpu import eval as E

    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    variants = [
        ("w11_good35_rep60", {"tracking": {"lk_window": 11,
                                           "replenish_min_inliers": 60},
                              "features": {"num_features_tracking_good": 35}}),
        ("w7_good35_rep60", {"tracking": {"replenish_min_inliers": 60},
                             "features": {"num_features_tracking_good": 35}}),
        ("w11_good35_rep60_pool30",
         {"tracking": {"lk_window": 11, "replenish_min_inliers": 60,
                       "replenish_min_pool": 30},
          "features": {"num_features_tracking_good": 35}}),
    ]
    out = {}
    for name, ov in variants:
        rows = []
        for s in range(1, 1 + n_seeds):
            rec = E.run_world_eval(n_frames=548, h=120, w=188, seed=s,
                                   vo_baseline=False, cfg_overrides=ov)
            rows.append({"seed": s, "ate_m": rec["ate_m"],
                         "lost_at": rec["lost_at"], "n_kf": rec["n_kf"],
                         "kf_rate": rec["kf_rate"],
                         "edges": len(rec["loop_edges"])})
            print(f"[{name} seed {s}] ate={rec['ate_m']:.2f} "
                  f"kf_rate={rec['kf_rate']:.2f} edges={len(rec['loop_edges'])} "
                  f"lost={rec['lost_at']}", flush=True)
        ates = [r["ate_m"] for r in rows if r["lost_at"] is None]
        out[name] = {
            "rows": rows,
            "n_lost": sum(1 for r in rows if r["lost_at"] is not None),
            "ate_mean": round(float(np.mean(ates)), 2) if ates else None,
            "kf_rate_mean": round(float(np.mean([r["kf_rate"] for r in rows])), 3),
            "edges_median": float(np.median([r["edges"] for r in rows])),
        }
        print(f"[{name}] mean={out[name]['ate_mean']} "
              f"kf_rate={out[name]['kf_rate_mean']} "
              f"edges_med={out[name]['edges_median']} "
              f"lost={out[name]['n_lost']}", flush=True)
    with open(os.path.join(os.path.dirname(__file__),
                           "SWEEP_LOWRES_CFG.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
