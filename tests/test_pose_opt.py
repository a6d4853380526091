"""Pose-only LM: Jacobian vs autodiff, convergence, outlier rejection."""

import jax
import jax.numpy as jnp
import numpy as np

from stereoslam_tpu.ops import se3
from stereoslam_tpu.ops.camera import Intrinsics, world2pixel
from stereoslam_tpu.ops.lm import optimize_pose, project_jacobian

INTR = Intrinsics.create(718.856, 718.856, 607.1928, 185.2157)


def make_scene(rng, n=200):
    X = rng.uniform([-10, -5, 4], [10, 5, 50], (n, 3)).astype(np.float32)
    xi_true = np.array([0.3, -0.1, 0.8, 0.02, -0.04, 0.01], np.float32)
    T_true = se3.exp(jnp.asarray(xi_true))
    px = world2pixel(jnp.asarray(X), T_true, INTR)
    return jnp.asarray(X), T_true, px


def test_jacobian_matches_autodiff(rng):
    X, T_true, _ = make_scene(rng, 16)

    def proj(xi, Xi):
        T = se3.left_update(T_true, xi)
        return world2pixel(Xi, T, INTR)

    _, J_analytic = project_jacobian(T_true, X, INTR)
    J_auto = jax.jacobian(proj)(jnp.zeros(6, jnp.float32), X)  # (N,2,6)
    # d(residual)/dxi = -d(px)/dxi: project_jacobian returns d(px)/dxi.
    np.testing.assert_allclose(np.asarray(J_auto), np.asarray(J_analytic), rtol=2e-3, atol=2e-2)


def test_converges_from_perturbed_pose(rng):
    X, T_true, px = make_scene(rng)
    T0 = se3.left_update(T_true, jnp.asarray([0.1, -0.05, 0.1, 0.01, 0.02, -0.01], jnp.float32))
    valid = jnp.ones(X.shape[0], bool)
    res = optimize_pose(T0, X, px, valid, INTR)
    err = np.asarray(se3.log(se3.inv(res.T_cw) @ T_true))
    assert np.abs(err).max() < 1e-3
    assert int(res.num_inliers) == X.shape[0]


def test_outliers_rejected(rng):
    X, T_true, px = make_scene(rng)
    px_np = np.asarray(px).copy()
    n_out = 40
    px_np[:n_out] += rng.uniform(20, 80, (n_out, 2)) * np.sign(rng.standard_normal((n_out, 2)))
    T0 = se3.left_update(T_true, jnp.asarray([0.05, 0.0, 0.05, 0.005, 0.01, 0.0], jnp.float32))
    valid = jnp.ones(X.shape[0], bool)
    res = optimize_pose(T0, X, jnp.asarray(px_np), valid, INTR)
    inl = np.asarray(res.inlier)
    assert not inl[:n_out].any()          # all corrupted obs classified out
    assert inl[n_out:].mean() > 0.98      # clean obs kept
    err = np.asarray(se3.log(se3.inv(res.T_cw) @ T_true))
    assert np.abs(err).max() < 1e-3


def test_invalid_slots_ignored(rng):
    X, T_true, px = make_scene(rng, 100)
    # Garbage in invalid slots must not affect the solution.
    X_junk = X.at[50:].set(jnp.asarray(rng.standard_normal((50, 3)).astype(np.float32) * 1e3))
    valid = jnp.arange(100) < 50
    T0 = se3.left_update(T_true, jnp.asarray([0.08, 0.0, -0.06, 0.0, 0.01, 0.01], jnp.float32))
    res = optimize_pose(T0, X_junk, px, valid, INTR)
    err = np.asarray(se3.log(se3.inv(res.T_cw) @ T_true))
    assert np.abs(err).max() < 2e-3
    assert int(res.num_inliers) == 50


def test_jit_stable():
    rng = np.random.default_rng(3)
    X, T_true, px = make_scene(rng, 64)
    f = jax.jit(lambda T0, X, px, valid: optimize_pose(T0, X, px, valid, INTR))
    res = f(T_true, X, px, jnp.ones(64, bool))
    assert int(res.num_inliers) == 64
