"""Loop-correction guard rails: a marginal/garbage verification must never
be able to wreck the map (VERDICT r2 #3).

The reference applies any verified correction unconditionally
(loopclosing.cpp:437-459); its protection is the discriminative power of the
descriptor + ORB stack.  Here the correction is additionally gated
(config.py LoopClosingConfig: inlier ratio, odometry-bounded correction
magnitude) and the fusion+PGO result is checked for graph consistency with
an atomic on-device rollback.  These tests pin that behavior on the exact
failure round 2 shipped: a wildly-wrong "verified" pose reaching the
correction stage.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from stereoslam_tpu.config import (
    FeatureConfig,
    LoopClosingConfig,
    MapConfig,
    SlamConfig,
)
from stereoslam_tpu.core import state as state_mod
from stereoslam_tpu.core.loopclosing import LoopCloser
from stereoslam_tpu.core.system import StereoSlam
from stereoslam_tpu.models.calc import DescriptorModel
from stereoslam_tpu.ops.camera import Intrinsics
from stereoslam_tpu.utils.metrics import ate_rmse
from stereoslam_tpu.utils.synthetic import generate_sequence

from tests.test_system_loop import loop_cfg


def _chain_map(cfg, K=48, radius=6.0):
    """A synthetic consistent KF chain around a circle: exact poses, exact
    sequential edges, last W KFs active."""
    m = state_mod.init_map_state(cfg)
    th = 2 * np.pi * np.arange(K) / K
    T_cw = np.broadcast_to(np.eye(4, dtype=np.float32), (K, 4, 4)).copy()
    T_cw[:, 0, 3] = radius * np.cos(th)
    T_cw[:, 2, 3] = radius * np.sin(th)
    rel = np.einsum("kij,kjl->kil", T_cw[1:], np.linalg.inv(T_cw[:-1]))
    W = cfg.map.active_window
    active = np.full(W, -1, np.int32)
    active[:W] = np.arange(K - W, K, dtype=np.int32)
    return m._replace(
        kf_T_cw=m.kf_T_cw.at[:K].set(jnp.asarray(T_cw)),
        kf_valid=m.kf_valid.at[:K].set(True),
        kf_prev=m.kf_prev.at[1:K].set(jnp.arange(K - 1, dtype=jnp.int32)),
        kf_rel_prev=m.kf_rel_prev.at[1:K].set(jnp.asarray(rel)),
        n_kf=jnp.int32(K),
        active_kf=jnp.asarray(active),
        n_active=jnp.int32(W),
    ), T_cw


def _small_cfg():
    return SlamConfig(
        features=FeatureConfig(
            n_init_features=16, n_new_features=8, max_features=16, n_levels=2
        ),
        map=MapConfig(max_keyframes=64, max_landmarks=256),
        loop=LoopClosingConfig(),
    )


@pytest.fixture(scope="module")
def closer_and_map():
    cfg = _small_cfg()
    lc = LoopCloser(cfg, Intrinsics.create(160.0, 160.0, 94.0, 60.0),
                    descriptor_model=DescriptorModel())
    m, T_cw = _chain_map(cfg, K=48)
    loop = state_mod.init_loop_state(cfg)
    return cfg, lc, m, T_cw, loop


def _register_edge(m, kf_id, loop_kf, T_corrected):
    rel = jnp.asarray(T_corrected) @ jnp.linalg.inv(m.kf_T_cw[loop_kf])
    return m._replace(
        kf_loop=m.kf_loop.at[kf_id].set(loop_kf),
        kf_rel_loop=m.kf_rel_loop.at[kf_id].set(rel),
    )


def test_garbage_correction_rolls_back(closer_and_map):
    cfg, lc, m, T_cw, loop = closer_and_map
    kf_id, loop_kf = 47, 2
    T_bad = np.eye(4, dtype=np.float32)
    T_bad[:3, 3] = [80.0, -40.0, 60.0]   # "verified" pose 100+ m off
    m_in = _register_edge(m, kf_id, loop_kf, T_bad)
    n_feat = m.kf_feat_lm.shape[1]
    m_out, loop_out, remap, packed = lc._jit_correct(
        m_in, loop, jnp.int32(kf_id), jnp.int32(loop_kf),
        jnp.asarray(T_bad), jnp.full((n_feat,), -1, jnp.int32),
    )
    applied, mean_res, bound = np.asarray(packed)
    assert applied == 0.0, f"garbage correction applied (res {mean_res})"
    # Map poses untouched, loop edge withdrawn.
    np.testing.assert_allclose(np.asarray(m_out.kf_T_cw[:48]), T_cw, atol=1e-6)
    assert int(m_out.kf_loop[kf_id]) == -1
    np.testing.assert_array_equal(np.asarray(remap), np.arange(m.capacity_lm))


def test_plausible_correction_applies(closer_and_map):
    cfg, lc, m, T_cw, loop = closer_and_map
    kf_id, loop_kf = 47, 2
    # A modest drift correction: 0.25 m along x from the true pose.
    T_good = T_cw[kf_id].copy()
    T_good[0, 3] += 0.25
    m_in = _register_edge(m, kf_id, loop_kf, T_good)
    n_feat = m.kf_feat_lm.shape[1]
    m_out, loop_out, remap, packed = lc._jit_correct(
        m_in, loop, jnp.int32(kf_id), jnp.int32(loop_kf),
        jnp.asarray(T_good), jnp.full((n_feat,), -1, jnp.int32),
    )
    applied, mean_res, bound = np.asarray(packed)
    assert applied == 1.0, f"plausible correction rolled back (res {mean_res})"
    assert int(m_out.kf_loop[kf_id]) == loop_kf
    # The current KF took the corrected pose.
    np.testing.assert_allclose(
        np.asarray(m_out.kf_T_cw[kf_id]), T_good, atol=1e-4
    )
    assert int(loop_out.last_closed_kf) == kf_id


def test_injected_garbage_verify_cannot_degrade_trajectory():
    """End-to-end (VERDICT r2 #3 'done' criterion): force the verification
    stage to hand the correction a wildly wrong pose; the run must finish
    with VO-grade accuracy (rollback) and report no loop edge."""
    seq = generate_sequence(
        n_frames=150, loop_frames=120, trajectory="loop", speed=0.35, seed=7,
        n_points=900,
    )
    cfg = loop_cfg(seq)
    slam = StereoSlam(cfg, enable_backend=True, enable_loop=True,
                      descriptor_model=DescriptorModel())

    lc = slam._loop_closer
    orig_verify = lc._jit_verify
    n_bad = [0]

    def bad_verify(map_state, loop, kf_id, loop_kf, key):
        verify, packed, map_out = orig_verify(map_state, loop, kf_id, loop_kf, key)
        T_bad = np.eye(4, dtype=np.float32)
        T_bad[:3, 3] = [50.0, -30.0, 20.0]
        map_out = _register_edge(map_out, int(kf_id), int(loop_kf), T_bad)
        n_bad[0] += 1
        return (
            verify._replace(
                verified=jnp.bool_(True),
                need_correct=jnp.bool_(True),
                T_corrected=jnp.asarray(T_bad),
            ),
            # [verified, need_correct, pose_err_m, odometry_m]
            jnp.asarray([1.0, 1.0, 61.6, 40.0], jnp.float32),
            map_out,
        )

    lc._jit_verify = bad_verify

    est = []
    for t in range(len(seq.left)):
        ok = slam.process_frame(seq.left[t], seq.right[t], seq.timestamps[t])
        assert ok, f"tracking lost at frame {t}"
        est.append(slam.current_pose())
    slam._drain()
    est = np.stack(est).astype(np.float64)

    assert n_bad[0] >= 1, "loop detection never fired; test exercised nothing"
    assert slam.loop_edges == [], "rolled-back correction was reported as an edge"
    gt = np.linalg.inv(seq.T_cw.astype(np.float64))
    ate = ate_rmse(np.linalg.inv(est), gt, align=False)
    assert ate < 1.0, f"garbage verify degraded ATE to {ate:.3f} m"
