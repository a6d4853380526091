#!/usr/bin/env python
"""Multi-seed A/B of config variants on the canonical world.

The r5 single-sample sweeps showed ±1 m ATE swings from perturbations as
small as one BA iteration (0.71 -> 1.23): 548 chained frames amplify any
numeric difference chaotically, so ranking configs needs a seed ensemble.
Each seed renders a DIFFERENT world (texture + geometry), giving scenario
diversity; per-variant mean/max over seeds is the decision statistic.

Writes scripts/SWEEP_SEEDS_AB.json.

Usage: python scripts/sweep_seeds_ab.py [n_seeds]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from stereoslam_tpu import eval as E

    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    variants = [
        ("ba38", None),  # shipped defaults after the r5 change
        ("ba38_lv3", {"tracking": {"lk_levels": 3}}),
        ("ba38_lv3_fb3", {"tracking": {"lk_levels": 3, "lk_fb_levels": 3}}),
    ]
    out = {}
    for name, ov in variants:
        rows = []
        for s in range(1, 1 + n_seeds):
            rec = E.run_world_eval(n_frames=548, seed=s, vo_baseline=False,
                                   cfg_overrides=ov)
            rows.append({"seed": s, "ate_m": rec["ate_m"],
                         "lost_at": rec["lost_at"],
                         "edges": len(rec["loop_edges"]), "n_kf": rec["n_kf"]})
            print(f"[{name} seed {s}] ate={rec['ate_m']:.3f} "
                  f"edges={len(rec['loop_edges'])} lost={rec['lost_at']}",
                  flush=True)
        ates = [r["ate_m"] for r in rows if r["lost_at"] is None]
        out[name] = {
            "rows": rows,
            "n_lost": sum(1 for r in rows if r["lost_at"] is not None),
            "ate_mean": round(float(np.mean(ates)), 3) if ates else None,
            "ate_max": round(float(np.max(ates)), 3) if ates else None,
            "edges_median": float(np.median([r["edges"] for r in rows])),
        }
        print(f"[{name}] mean={out[name]['ate_mean']} max={out[name]['ate_max']} "
              f"lost={out[name]['n_lost']}", flush=True)
    with open(os.path.join(os.path.dirname(__file__), "SWEEP_SEEDS_AB.json"),
              "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
