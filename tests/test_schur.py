"""Windowed Schur-complement BA tests on synthetic geometry."""

import jax
import jax.numpy as jnp
import numpy as np

from stereoslam_tpu.ops import se3
from stereoslam_tpu.ops.camera import Intrinsics, world2pixel
from stereoslam_tpu.ops.schur import BAProblem, solve_window_ba

INTR = Intrinsics.create(400.0, 400.0, 320.0, 160.0)


def make_problem(rng, W=5, N=120, C=200, noise_px=0.0, pose_noise=0.0, lm_noise=0.0,
                 n_outliers=0, n_fixed=30):
    # Ground truth: cameras along a line, landmarks ahead.
    xi = np.zeros((W, 6), np.float32)
    xi[:, 2] = -np.arange(W) * 0.5  # camera moves +z in world => T_cw translates -z
    cam_T_gt = np.asarray(se3.exp(jnp.asarray(xi)))
    X_gt = rng.uniform([-8, -4, 6], [8, 4, 30], (C, 3)).astype(np.float32)

    obs_lm = rng.integers(0, C, (W, N)).astype(np.int32)
    px = np.zeros((W, N, 2), np.float32)
    for w in range(W):
        px[w] = np.asarray(world2pixel(jnp.asarray(X_gt[obs_lm[w]]), jnp.asarray(cam_T_gt[w]), INTR))
    valid = (px[..., 0] > 5) & (px[..., 0] < 635) & (px[..., 1] > 5) & (px[..., 1] < 315)
    px += rng.normal(0, noise_px, px.shape).astype(np.float32)
    if n_outliers:
        ww = rng.integers(0, W, n_outliers)
        nn = rng.integers(0, N, n_outliers)
        px[ww, nn] += rng.uniform(30, 90, (n_outliers, 2)).astype(np.float32)

    cam_T0 = cam_T_gt.copy()
    if pose_noise:
        dx = rng.normal(0, pose_noise, (W, 6)).astype(np.float32)
        dx[0] = 0  # keep first camera at gt: a gauge for comparison
        cam_T0 = np.asarray(se3.exp(jnp.asarray(dx)) @ jnp.asarray(cam_T_gt))
    X0 = X_gt + rng.normal(0, lm_noise, X_gt.shape).astype(np.float32)

    lm_fixed = np.zeros(C, bool)
    lm_fixed[:n_fixed] = True  # anchors pin the gauge
    X0[lm_fixed] = X_gt[lm_fixed]

    prob = BAProblem(
        cam_T=jnp.asarray(cam_T0),
        cam_valid=jnp.ones(W, bool),
        cam_fixed=jnp.zeros(W, bool),
        lm_pos=jnp.asarray(X0),
        lm_valid=jnp.ones(C, bool),
        lm_fixed=jnp.asarray(lm_fixed),
        obs_px=jnp.asarray(px),
        obs_lm=jnp.asarray(obs_lm),
        obs_valid=jnp.asarray(valid),
    )
    return prob, cam_T_gt, X_gt, valid


def test_recovers_from_noise(rng):
    prob, cam_gt, X_gt, _ = make_problem(
        rng, pose_noise=0.02, lm_noise=0.05, noise_px=0.0
    )
    res = jax.jit(lambda p: solve_window_ba(p, INTR))(prob)
    pose_err = np.asarray(
        jax.vmap(lambda a, b: se3.log(a @ se3.inv(b)))(res.cam_T, jnp.asarray(cam_gt))
    )
    assert np.abs(pose_err).max() < 2e-3
    free = ~np.asarray(prob.lm_fixed)
    lm_err = np.linalg.norm(np.asarray(res.lm_pos) - X_gt, axis=1)
    assert np.median(lm_err[free]) < 2e-2


def test_outliers_classified(rng):
    prob, cam_gt, X_gt, valid = make_problem(
        rng, pose_noise=0.01, lm_noise=0.02, n_outliers=60
    )
    res = solve_window_ba(prob, INTR)
    chi2 = np.asarray(res.chi2)
    inl = np.asarray(res.obs_inlier)
    # Everything classified inlier must reproject well.
    assert chi2[inl].max() <= 5.991 + 1e-3
    # The vast majority of clean observations survive.
    assert inl.sum() > 0.8 * valid.sum() - 60


def test_fixed_landmarks_do_not_move(rng):
    prob, _, X_gt, _ = make_problem(rng, pose_noise=0.02, lm_noise=0.0)
    res = solve_window_ba(prob, INTR)
    fixed = np.asarray(prob.lm_fixed)
    np.testing.assert_array_equal(
        np.asarray(res.lm_pos)[fixed], np.asarray(prob.lm_pos)[fixed]
    )


def test_masked_slots_inert(rng):
    prob, cam_gt, _, _ = make_problem(rng, W=5, pose_noise=0.02, lm_noise=0.03)
    # Invalidate the last window slot; its pose must remain untouched.
    cam_valid = np.ones(5, bool)
    cam_valid[4] = False
    prob2 = prob._replace(cam_valid=jnp.asarray(cam_valid))
    res = solve_window_ba(prob2, INTR)
    np.testing.assert_array_equal(np.asarray(res.cam_T)[4], np.asarray(prob.cam_T)[4])
    # Other poses still improve.
    err = np.asarray(se3.log(res.cam_T[1] @ se3.inv(jnp.asarray(cam_gt[1]))))
    err0 = np.asarray(se3.log(prob.cam_T[1] @ se3.inv(jnp.asarray(cam_gt[1]))))
    assert np.abs(err).max() < np.abs(err0).max()
