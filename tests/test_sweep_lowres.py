"""Low-resolution robustness envelope (VERDICT r3 next-round #5).

`SWEEP_LOWRES.json` pins a 10-seed sweep of the CANONICAL 90x50 m circuit
at HALF resolution (120x188, i.e. half the pixels-of-parallax per frame the
tracker was designed around): measured on the TPU, **zero LOST across all
seeds** with VO-grade drift (mean ATE ~14 m over a ~300 m course, loop
closing still firing on true revisits).  The envelope test asserts the
robustness floor — never LOST, drift bounded — NOT canonical accuracy;
the accuracy claim lives at the canonical resolution (EVAL_WORLD.json).

Regenerate with:  python scripts/sweep_world.py --h 120 --w 188 --seeds 10
"""

import json
import os

import pytest

_SWEEP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "SWEEP_LOWRES.json")


def test_committed_sweep_has_no_lost_runs():
    """The committed sweep artifact itself: every seed survived."""
    assert os.path.exists(_SWEEP)
    with open(_SWEEP) as f:
        s = json.load(f)
    assert s["seeds"] >= 10 and s["n_lost"] == 0
    assert all(r["lost_at"] is None for r in s["records"])
    assert s["ate_max"] < 25.0  # drift envelope on the ~300 m course
    # Loop detection keeps firing even at half resolution.
    assert sum(r["loop_edges"] for r in s["records"]) >= s["seeds"]


@pytest.mark.skipif(
    not os.environ.get("STEREOSLAM_SLOW_TESTS"),
    reason="3 full 548-frame low-res runs; set STEREOSLAM_SLOW_TESTS=1",
)
def test_lowres_robustness_reproduces():
    """Re-run a 3-seed slice of the sweep and hold the committed envelope."""
    from stereoslam_tpu import eval as E

    for seed in (1, 2, 3):
        rec = E.run_world_eval(h=120, w=188, seed=seed, vo_baseline=False)
        assert rec["lost_at"] is None, f"seed {seed} LOST at {rec['lost_at']}"
        assert rec["ate_m"] < 25.0, (seed, rec["ate_m"])
