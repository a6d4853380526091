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


def test_banded_remap_matches_gather_remap(rng):
    """The banded two-pass (gather-free) remap agrees with the reference
    per-pixel bilinear remap on a realistic radial-distortion warp."""
    import jax.numpy as jnp

    from stereoslam_tpu.ops.camera import (
        Intrinsics,
        banded_remap,
        banded_remap_plan,
        undistort_image,
        undistortion_map,
    )

    H, W = 94, 310  # KITTI-like aspect, scaled down
    intr = Intrinsics.create(180.0, 180.0, W / 2, H / 2)
    dist = jnp.asarray([-0.28, 0.07, 1e-3, -5e-4])
    src = undistortion_map(H, W, intr, dist)
    plan = banded_remap_plan(src)
    assert plan.jx_hi - plan.jx_lo >= 1  # the warp has a real residual band

    # Smooth-ish image (real imagery is band-limited; the two-pass
    # approximation error scales with image gradient x warp curvature).
    img = rng.standard_normal((H, W)).astype(np.float32)
    from stereoslam_tpu.ops.image import gaussian_blur

    img = np.asarray(gaussian_blur(jnp.asarray(img), sigma=1.5, radius=4)) * 60 + 128

    ref = np.asarray(undistort_image(jnp.asarray(img), src))
    fast = np.asarray(banded_remap(jnp.asarray(img), plan))
    err = np.abs(ref - fast)
    # Interior agreement (borders differ by clamp convention).
    interior = err[4:-4, 4:-4]
    assert interior.max() < 1.5, interior.max()   # < 0.6% of 8-bit range
    assert interior.mean() < 0.05, interior.mean()


def test_banded_remap_identity_when_undistorted():
    import jax.numpy as jnp

    from stereoslam_tpu.ops.camera import (
        Intrinsics, banded_remap, banded_remap_plan, undistortion_map,
    )

    H, W = 40, 60
    intr = Intrinsics.create(50.0, 50.0, 30.0, 20.0)
    plan = banded_remap_plan(undistortion_map(H, W, intr, jnp.zeros(4)))
    img = jnp.arange(H * W, dtype=jnp.float32).reshape(H, W)
    out = np.asarray(banded_remap(img, plan))
    np.testing.assert_allclose(out[:, :-1], np.asarray(img)[:, :-1], atol=0.1)
