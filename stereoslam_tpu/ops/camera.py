"""Batched pinhole stereo camera operations.

TPU-native replacement for the reference ``Camera`` class (reference
include/myslam/camera.h:35-47, src/camera.cpp:9-48): the same
world<->camera<->pixel transform chain, but as pure functions broadcasting
over arbitrarily many points/poses at once.

Conventions match the reference: ``pose`` is T_cw (world -> camera, the
"extrinsic" of camera w.r.t. the tracked body frame is folded in by the
caller), the right camera sits at ``x = -baseline`` in the left camera frame
(reference src/system.cpp:116).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from stereoslam_tpu.ops import se3


class Intrinsics(NamedTuple):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray

    @staticmethod
    def create(fx, fy, cx, cy) -> "Intrinsics":
        return Intrinsics(
            jnp.float32(fx), jnp.float32(fy), jnp.float32(cx), jnp.float32(cy)
        )

    def K(self) -> jnp.ndarray:
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=jnp.float32,
        )


def world2camera(p_w: jnp.ndarray, T_cw: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) world points -> camera frame (reference camera.cpp:9-12)."""
    return se3.act(T_cw, p_w)


def camera2world(p_c: jnp.ndarray, T_cw: jnp.ndarray) -> jnp.ndarray:
    return se3.act(se3.inv(T_cw), p_c)


def camera2pixel(p_c: jnp.ndarray, intr: Intrinsics) -> jnp.ndarray:
    """Project camera-frame points to pixels (reference camera.cpp:19-24).

    Depth is clamped away from zero so the op stays finite under jit; callers
    mask out non-positive-depth points via :func:`depth_of`.
    """
    z = p_c[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = intr.fx * p_c[..., 0] / z_safe + intr.cx
    v = intr.fy * p_c[..., 1] / z_safe + intr.cy
    return jnp.stack([u, v], axis=-1)


def pixel2camera(px: jnp.ndarray, intr: Intrinsics, depth=1.0) -> jnp.ndarray:
    """Back-project pixels at given depth (reference camera.cpp:26-30)."""
    depth = jnp.asarray(depth, dtype=px.dtype)
    x = (px[..., 0] - intr.cx) / intr.fx * depth
    y = (px[..., 1] - intr.cy) / intr.fy * depth
    return jnp.stack([x, y, jnp.broadcast_to(depth, x.shape)], axis=-1)


def world2pixel(p_w: jnp.ndarray, T_cw: jnp.ndarray, intr: Intrinsics) -> jnp.ndarray:
    return camera2pixel(world2camera(p_w, T_cw), intr)


def pixel2world(px: jnp.ndarray, T_cw: jnp.ndarray, intr: Intrinsics, depth=1.0) -> jnp.ndarray:
    return camera2world(pixel2camera(px, intr, depth), T_cw)


def depth_of(p_w: jnp.ndarray, T_cw: jnp.ndarray) -> jnp.ndarray:
    """z in the camera frame, for cheirality masks."""
    return world2camera(p_w, T_cw)[..., 2]


def stereo_right_pose(baseline) -> jnp.ndarray:
    """T of the right camera relative to the left: translation (-b, 0, 0)
    brings a left-frame point into the right frame (reference system.cpp:116
    builds the right extrinsic with t = (-baseline, 0, 0))."""
    t = jnp.array([-float(baseline), 0.0, 0.0], dtype=jnp.float32)
    return se3.from_Rt(jnp.eye(3, dtype=jnp.float32), t)


def undistortion_map(
    h: int, w: int, intr: Intrinsics, dist: jnp.ndarray
) -> jnp.ndarray:
    """Precompute the (H, W, 2) source-coordinate grid for image
    undistortion — the functional equivalent of ``cv::initUndistortRectifyMap``
    used by the reference's ``Camera::UndistortImage`` (camera.cpp:36-48).

    For each undistorted pixel, gives the (x, y) position in the distorted
    input to sample (forward distortion model, no iteration needed).
    """
    k1, k2, p1, p2 = dist[0], dist[1], dist[2], dist[3]
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    x = (xs[None, :] - intr.cx) / intr.fx
    y = (ys[:, None] - intr.cy) / intr.fy
    x = jnp.broadcast_to(x, (h, w))
    y = jnp.broadcast_to(y, (h, w))
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + k2 * r2)
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd * intr.fx + intr.cx, yd * intr.fy + intr.cy], axis=-1)


def undistort_image(img: jnp.ndarray, src_map: jnp.ndarray) -> jnp.ndarray:
    """Bilinear remap through a precomputed :func:`undistortion_map` grid."""
    from stereoslam_tpu.ops.image import bilinear_sample

    return bilinear_sample(img, src_map)


def undistort_points(px: jnp.ndarray, intr: Intrinsics, dist: jnp.ndarray, iters: int = 5) -> jnp.ndarray:
    """Iteratively undo radial/tangential distortion (k1, k2, p1, p2).

    Functional analog of the reference's image-space ``cv::undistort``
    (camera.cpp:36-48) — but applied to sparse points, which is what the
    sparse pipeline actually needs (the dense remap wastes bandwidth on
    pixels no kernel reads).
    """
    k1, k2, p1, p2 = dist[0], dist[1], dist[2], dist[3]
    x0 = (px[..., 0] - intr.cx) / intr.fx
    y0 = (px[..., 1] - intr.cy) / intr.fy
    x, y = x0, y0
    for _ in range(iters):
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + k2 * r2)
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x = (x0 - dx) / radial
        y = (y0 - dy) / radial
    return jnp.stack([x * intr.fx + intr.cx, y * intr.fy + intr.cy], axis=-1)
