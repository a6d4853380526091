"""Unit tests for frontend/map bookkeeping: slot compaction, detection fill,
window eviction, and the loop-closing insertion cooldown."""

import jax.numpy as jnp
import numpy as np

from stereoslam_tpu.config import FeatureConfig, MapConfig, SlamConfig
from stereoslam_tpu.core import frontend as F
from stereoslam_tpu.core.state import TrackState, init_map_state
from stereoslam_tpu.ops import se3
from tests.test_features import checker_image


CFG = SlamConfig(
    features=FeatureConfig(
        n_init_features=64, n_new_features=32, max_features=96,
        num_features_init_good=16, num_features_tracking_good=12,
        num_features_tracking_bad=4,
    ),
    map=MapConfig(max_keyframes=32, max_landmarks=2048, active_window=3),
    image_height=240, image_width=320,
)


def make_tracks(n_valid, N=96):
    xy = np.zeros((N, 2), np.float32)
    xy[:n_valid] = np.random.default_rng(0).uniform(40, 200, (n_valid, 2))
    lm = np.full(N, -1, np.int32)
    lm[: n_valid // 2] = np.arange(n_valid // 2)
    valid = np.zeros(N, bool)
    valid[:n_valid] = True
    return TrackState(xy=jnp.asarray(xy), lm_idx=jnp.asarray(lm), valid=jnp.asarray(valid))


def test_compact_tracks_stable():
    tr = make_tracks(10)
    # Scatter the valid entries around.
    perm = np.random.default_rng(1).permutation(96)
    tr2 = TrackState(xy=tr.xy[perm], lm_idx=tr.lm_idx[perm], valid=tr.valid[perm])
    out = F._compact_tracks(tr2)
    v = np.asarray(out.valid)
    assert v[:10].all() and not v[10:].any()
    # Landmark links move with their positions.
    src = {(float(x), float(y)): int(l) for (x, y), l, ok in
           zip(np.asarray(tr2.xy), np.asarray(tr2.lm_idx), np.asarray(tr2.valid)) if ok}
    for (x, y), l in zip(np.asarray(out.xy)[:10], np.asarray(out.lm_idx)[:10]):
        assert src[(float(x), float(y))] == int(l)


def test_detect_and_fill_appends(rng):
    img = jnp.asarray(checker_image(rng, 240, 320))
    tr = make_tracks(20)
    out = F._detect_and_fill(tr, img, 32, CFG)
    v = np.asarray(out.valid)
    assert v.sum() > 20  # new detections appended
    # Existing tracks preserved in the low slots.
    np.testing.assert_array_equal(np.asarray(out.lm_idx)[:10], np.arange(10))
    # New slots carry no landmark link.
    new = v & (np.arange(96) >= 20)
    assert (np.asarray(out.lm_idx)[new] == -1).all()


def test_window_eviction_farthest():
    m = init_map_state(CFG)
    # Insert 3 KFs along a line; window full. 4th forces eviction.
    tr = make_tracks(0)
    poses = [se3.exp(jnp.asarray([0.0, 0, -z, 0, 0, 0], jnp.float32)) for z in [0.0, 1.0, 2.0, 2.3]]
    for i, T in enumerate(poses):
        m, kf_id = F.insert_keyframe(m, tr, T, jnp.float32(i), jnp.int32(i), CFG)
    active = np.asarray(m.active_kf)
    assert int(m.n_active) == 3
    # KF0 is farthest from KF3 (3.0 - 0.0 > min dist) -> evicted.
    assert 0 not in active[:3].tolist()
    assert set(active[: 3].tolist()) == {1, 2, 3}


def test_window_eviction_nearest():
    m = init_map_state(CFG)
    tr = make_tracks(0)
    # KF2 very close to the newest (0.05 < 0.2 threshold) -> evict nearest.
    zs = [0.0, 1.0, 2.0, 2.05]
    for i, z in enumerate(zs):
        T = se3.exp(jnp.asarray([0.0, 0, -z, 0, 0, 0], jnp.float32))
        m, kf_id = F.insert_keyframe(m, tr, T, jnp.float32(i), jnp.int32(i), CFG)
    active = set(np.asarray(m.active_kf)[:3].tolist())
    assert 2 not in active  # the nearest old KF got evicted
    assert active == {0, 1, 3}


def test_loop_cooldown(rng):
    """KFs within `insertion_cooldown` of the last closed loop are skipped
    entirely (reference loopclosing.cpp:674-679)."""
    from stereoslam_tpu.core.loopclosing import LoopCloser
    from stereoslam_tpu.core.state import init_loop_state
    from stereoslam_tpu.ops.camera import Intrinsics

    cfg = CFG
    lc = LoopCloser(cfg, Intrinsics.create(300.0, 300.0, 160.0, 120.0))
    m = init_map_state(cfg)
    loop = init_loop_state(cfg)
    loop = loop._replace(last_closed_kf=jnp.int32(10))
    img = jnp.asarray(checker_image(rng, 240, 320))

    out = lc.process_keyframe(m, loop, img, None, jnp.int32(13))
    assert float(jnp.linalg.norm(out.deep_db[13])) == 0.0  # skipped

    out2 = lc.process_keyframe(m, loop, img, None, jnp.int32(16))
    assert float(jnp.linalg.norm(out2.deep_db[16])) > 0.5  # processed

    m2, loop2, closed, _ = lc.detect_and_correct(m, loop, jnp.int32(13))
    assert not closed
