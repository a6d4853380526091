"""Reference-scale endurance evidence (VERDICT r4 next-round #3).

The reference's saved KITTI-00 artifacts span 4,541 frames / 742 keyframes /
17 loop edges (reference result/trajectory.txt, result/loopEdges.txt).  The
pinned ENDURANCE.json record (produced on the TPU by scripts/endurance.py)
is the repo's run at that scale; this test asserts its invariants so a
regression that breaks long-run behavior cannot ship while the artifact
claims otherwise.

A full re-run takes ~10 minutes on the TPU and is gated behind
STEREOSLAM_SLOW_TESTS (the artifact validation always runs).
"""

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RECORD = os.path.join(REPO, "ENDURANCE.json")


@pytest.fixture(scope="module")
def record():
    if not os.path.exists(RECORD):
        pytest.skip("ENDURANCE.json not yet pinned (run scripts/endurance.py)")
    with open(RECORD) as f:
        return json.load(f)


def test_endurance_scale_matches_reference(record):
    """The run covers the reference's scale: >=4,500 frames, >=700 KFs."""
    assert record["frames"] >= 4500
    assert record["n_kf"] >= 700
    assert record["params"]["frames"] == record["frames"], "run completed"


def test_endurance_never_lost(record):
    assert record["lost_at"] is None


def test_endurance_ate_bounded(record):
    """Drift stays bounded over ~11 laps with repeated corrections.  The
    canonical 1.3-lap record pins ~1 m; long runs accumulate between
    corrections, so the bound is looser but still far below the loop-OFF
    drift regime (3.4 m over 1.3 laps -> tens of meters over 11)."""
    assert record["ate_m"] <= 8.0


def test_endurance_repeated_loop_closures(record):
    """>=10 true-revisit edges (reference: 17 over the same frame count)."""
    assert record["true_revisit_edges"] >= 10


def test_endurance_compaction_fired_live(record):
    """The landmark allocator crossed its 90% threshold and compacted
    during the run (not just in unit tests)."""
    assert record["compactions"] >= 1


def test_endurance_o_k_work_stays_amortized(record):
    """Late-run frames are not paying linearly-grown costs: p50 latency at
    the end stays within 2x of the start, and the final-size DB scan is
    still millisecond-scale (one matmul over ~850 rows)."""
    assert record["frame_ms_p50_last800"] <= 2.0 * record["frame_ms_p50_first800"] + 5.0
    assert record["db_scan_ms_final"] is not None
    assert record["db_scan_ms_final"] < 20.0


@pytest.mark.skipif(
    not os.environ.get("STEREOSLAM_SLOW_TESTS"),
    reason="~10-minute endurance re-run; set STEREOSLAM_SLOW_TESTS=1",
)
def test_endurance_rerun_matches_pinned(record):
    from stereoslam_tpu import eval as E

    rec = E.run_endurance()
    assert rec["lost_at"] is None
    assert rec["n_kf"] >= 700
    assert rec["true_revisit_edges"] >= 10
