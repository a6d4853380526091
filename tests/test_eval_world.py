"""The ONE world-accuracy number, pinned (VERDICT r2 #4).

Round 2 reported 12 edges / ATE 0.4 m from one harness and 2 edges / 2.8 m
from another for nominally the same world.  Now ``bench.py`` Phase B,
``scripts/eval_world.py`` and this test all call
:func:`stereoslam_tpu.eval.run_world_eval`; the committed record
``EVAL_WORLD.json`` is regenerated whenever accuracy-relevant code changes
(``scripts/eval_world.py --out EVAL_WORLD.json``) and this test re-runs the
evaluation and compares against it.

The full-scale run takes ~10 min on CPU, so it is gated behind
STEREOSLAM_SLOW_TESTS; the fast test below exercises the same code path on
a small world every CI run.
"""

import json
import os

import numpy as np
import pytest

from stereoslam_tpu import eval as E

_RECORD = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "EVAL_WORLD.json")


def test_world_eval_plumbing_small():
    """run_world_eval executes end-to-end on a short world segment at the
    canonical camera (the default feature budget needs the full 240x376
    image to pass stereo init)."""
    rec = E.run_world_eval(n_frames=60)
    assert rec["frames"] >= 55 and rec["lost_at"] is None
    assert rec["ate_m"] < 1.0   # short straight-ish segment: VO-grade
    assert 0.05 <= rec["kf_rate"] <= 0.3
    assert rec["thresholds"]["similarity_high"] == 0.94


@pytest.mark.skipif(
    not os.environ.get("STEREOSLAM_SLOW_TESTS"),
    reason="full world circuit, ~10 min on CPU; set STEREOSLAM_SLOW_TESTS=1",
)
def test_world_eval_matches_committed_record():
    """Full-defaults evaluation reproduces the committed EVAL_WORLD.json."""
    assert os.path.exists(_RECORD), "EVAL_WORLD.json missing — run scripts/eval_world.py --out EVAL_WORLD.json"
    with open(_RECORD) as f:
        want = json.load(f)
    rec = E.run_world_eval()
    assert rec["params"] == want["params"], "eval defaults drifted from the record"
    # Loop coverage must not regress, and the matched pairs must stay true
    # revisits.
    assert len(rec["loop_edges"]) >= max(1, len(want["loop_edges"]) - 1)
    assert all(d < 5.0 for d in rec["edge_gt_dist_m"])
    # ATE within 50% of the committed record (platform numerics move the
    # trajectory slightly; an order-of-magnitude excursion is a regression).
    assert rec["ate_m"] <= want["ate_m"] * 1.5 + 0.1, (rec["ate_m"], want["ate_m"])
    assert abs(rec["kf_rate"] - want["kf_rate"]) < 0.06
