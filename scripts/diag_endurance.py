#!/usr/bin/env python
"""Diagnose the endurance LOST-at-lap-3 failure.

Two 3.5-lap runs: loop closing OFF (does pure VO+BA survive?) and ON with
INFO logging (correction magnitudes via the verify log).  Usage:
  python scripts/diag_endurance.py [laps]
"""

import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.INFO, format="%(levelname)s %(message)s")


def main():
    from stereoslam_tpu import eval as E

    laps = float(sys.argv[1]) if len(sys.argv) > 1 else 3.5
    rec_off = E.run_endurance(laps=laps, enable_loop=False)
    print("[loop OFF]", json.dumps({k: rec_off[k] for k in (
        "frames", "lost_at", "ate_m", "n_kf")}), flush=True)
    rec_on = E.run_endurance(laps=laps, enable_loop=True)
    print("[loop ON]", json.dumps({k: rec_on[k] for k in (
        "frames", "lost_at", "ate_m", "n_kf", "true_revisit_edges")}),
        flush=True)


if __name__ == "__main__":
    main()
