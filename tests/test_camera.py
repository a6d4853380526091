"""Camera projection + triangulation tests with known geometry."""

import jax.numpy as jnp
import numpy as np

from stereoslam_tpu.ops import se3
from stereoslam_tpu.ops.camera import (
    Intrinsics,
    camera2pixel,
    pixel2camera,
    stereo_right_pose,
    world2pixel,
)
from stereoslam_tpu.ops.triangulate import triangulate_stereo


INTR = Intrinsics.create(718.856, 718.856, 607.1928, 185.2157)


def test_project_backproject_roundtrip(rng):
    p_c = rng.uniform([-5, -5, 2], [5, 5, 40], (128, 3)).astype(np.float32)
    px = camera2pixel(jnp.asarray(p_c), INTR)
    p_back = pixel2camera(px, INTR, depth=jnp.asarray(p_c[:, 2]))
    # f32 cancellation in (u - cx) limits accuracy for points near the axis.
    np.testing.assert_allclose(np.asarray(p_back), p_c, rtol=1e-3, atol=2e-3)


def test_world2pixel_identity_pose():
    p_w = jnp.array([[0.0, 0.0, 10.0]])
    px = world2pixel(p_w, se3.identity((1,)), INTR)
    np.testing.assert_allclose(np.asarray(px[0]), [607.1928, 185.2157], atol=1e-3)


def test_triangulate_stereo_exact(rng):
    baseline = 386.1448 / 718.856
    T_l = se3.identity()
    T_r = stereo_right_pose(baseline)
    p_w = rng.uniform([-10, -3, 5], [10, 3, 60], (256, 3)).astype(np.float32)
    px_l = world2pixel(jnp.asarray(p_w), T_l, INTR)
    px_r = world2pixel(jnp.asarray(p_w), T_r, INTR)
    p_est, good = triangulate_stereo(px_l, px_r, T_l, T_r, INTR, INTR)
    assert bool(np.all(np.asarray(good)))
    np.testing.assert_allclose(np.asarray(p_est), p_w, rtol=5e-3, atol=2e-2)


def test_triangulate_rejects_degenerate():
    # Identical views: rays are parallel, the null space is not isolated.
    T = se3.identity()
    px = jnp.array([[600.0, 180.0]])
    _, good = triangulate_stereo(px, px, T, T, INTR, INTR)
    assert not bool(np.asarray(good)[0])


def test_triangulate_moving_cameras(rng):
    # Two arbitrary poses, not a rectified pair.
    T_a = se3.exp(jnp.asarray(np.array([0.1, -0.2, 0.05, 0.01, 0.02, -0.03], np.float32)))
    T_b = se3.exp(jnp.asarray(np.array([-0.4, 0.1, 0.3, -0.02, 0.05, 0.01], np.float32)))
    p_w = rng.uniform([-5, -2, 8], [5, 2, 30], (64, 3)).astype(np.float32)
    px_a = world2pixel(jnp.asarray(p_w), T_a, INTR)
    px_b = world2pixel(jnp.asarray(p_w), T_b, INTR)
    p_est, good = triangulate_stereo(px_a, px_b, T_a, T_b, INTR, INTR)
    assert np.asarray(good).mean() > 0.9
    err = np.linalg.norm(np.asarray(p_est) - p_w, axis=-1)
    assert np.median(err[np.asarray(good)]) < 0.05
