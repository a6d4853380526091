#!/usr/bin/env python
"""Batched multiseq loop closing, end to end (VERDICT r4 next-round #2b).

Drives B world-circuit sequences (different seeds — independent worlds)
through MultiSeqVO with verified loop closing ON, and the same frames with
loop closing OFF, then reports per-sequence keyframe-trajectory ATE both
ways.  Done-criterion: each sequence gets at least one VERIFIED, APPLIED
correction and batched ATE <= loop-OFF ATE.

Writes MULTISEQ_LOOP.json at the repo root.

Usage: python scripts/multiseq_world.py [--batch 2] [--frames 548]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(vos_kwargs, seqs, cfg, n):
    from stereoslam_tpu.parallel.multiseq import MultiSeqVO

    B = len(seqs)
    vo = MultiSeqVO(cfg, batch=B, **vos_kwargs)
    stack = lambda t, f: np.stack([getattr(s, f)[t] for s in seqs])
    vo.initialize(stack(0, "left"), stack(0, "right"),
                  np.asarray([s.timestamps[0] for s in seqs]))
    for t in range(1, n):
        vo.process_frames(stack(t, "left"), stack(t, "right"),
                          np.asarray([s.timestamps[t] for s in seqs]))
    vo.drain()
    return vo


def kf_ate(vo, b, seq):
    """Keyframe-trajectory ATE vs ground truth for sequence b."""
    n_kf = int(np.asarray(vo.maps.n_kf[b]))
    fid = np.asarray(vo.maps.kf_frame_id[b])[:n_kf]
    T = np.asarray(vo.maps.kf_T_cw[b][:n_kf]).astype(np.float64)
    est = np.stack([np.linalg.inv(t) for t in T])
    gt = np.linalg.inv(seq.T_cw[fid].astype(np.float64))
    gt = np.linalg.inv(gt[0]) @ gt
    err = est[:, :3, 3] - gt[:, :3, 3]
    return float(np.sqrt((err ** 2).sum(-1).mean()))


def main():
    from stereoslam_tpu import eval as E
    from stereoslam_tpu.config import CameraConfig, SlamConfig
    from stereoslam_tpu.utils import world as W

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--frames", type=int, default=548)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "MULTISEQ_LOOP.json"))
    args = ap.parse_args()

    B, n = args.batch, args.frames
    seqs = [
        W.generate_world_sequence(
            n_frames=n, h=E.WORLD_H, w=E.WORLD_W, fx=320.0, seed=E.WORLD_SEED + b,
            step=E.WORLD_STEP, length=E.WORLD_LENGTH, width=E.WORLD_WIDTH,
        )
        for b in range(B)
    ]
    s0 = seqs[0]
    cfg = SlamConfig(
        camera=CameraConfig(
            fx=s0.fx, fy=s0.fy, cx=s0.cx, cy=s0.cy,
            fx_right=s0.fx, fy_right=s0.fy, cx_right=s0.cx, cy_right=s0.cy,
            bf=s0.fx * s0.baseline,
        ),
        image_height=E.WORLD_H, image_width=E.WORLD_W,
    )

    vo_on = run(dict(enable_loop=True, verify_loops=True, kf_sub=2), seqs, cfg, n)
    vo_off = run(dict(enable_loop=False), seqs, cfg, n)

    rec = {"batch": B, "frames": n, "per_seq": []}
    for b in range(B):
        rec["per_seq"].append({
            "seed": E.WORLD_SEED + b,
            "ate_loop_on_m": round(kf_ate(vo_on, b, seqs[b]), 4),
            "ate_loop_off_m": round(kf_ate(vo_off, b, seqs[b]), 4),
            "n_kf": int(np.asarray(vo_on.maps.n_kf[b])),
            "detected_edges": vo_on.loop_edges(b),
            "applied_corrections": vo_on.loop_closures[b],
        })
    rec["all_corrected"] = all(len(s["applied_corrections"]) >= 1
                               for s in rec["per_seq"])
    rec["all_improved"] = all(s["ate_loop_on_m"] <= s["ate_loop_off_m"]
                              for s in rec["per_seq"])
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
