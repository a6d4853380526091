"""Intensity-centroid keypoint orientation (the "IC_Angle" of ORB).

Replaces the reference's per-keypoint scalar loop over a circular patch
(reference ORBextractor.cpp:27-55) with one batched gather + two masked
moment reductions: all keypoints' 31x31 patches are extracted at once and
``angle = atan2(m01, m10)`` is computed on the VPU.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from stereoslam_tpu.ops.image import extract_patches

HALF_PATCH = 15  # patch radius, reference ORBextractor.h HALF_PATCH_SIZE


@functools.lru_cache(maxsize=1)
def _moment_weights():
    """Circular-mask x/y coordinate weights, matching the reference's
    row-limited circle (umax table, ORBextractor.cpp:404-419)."""
    r = HALF_PATCH
    ys, xs = np.mgrid[-r : r + 1, -r : r + 1]
    # The reference's umax: for each |y|, max |x| = round(sqrt(r^2 - y^2))
    # computed with the symmetry fix-up; the continuous circle r + 0.5 is the
    # same set of pixels.
    inside = (xs * xs + ys * ys) <= (r + 0.5) ** 2
    # numpy (not jnp) so the cache never holds a traced constant.
    wx = np.where(inside, xs, 0).astype(np.float32)
    wy = np.where(inside, ys, 0).astype(np.float32)
    return wx, wy


def ic_angles(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Orientation (radians) per keypoint from intensity centroids.

    Args:
      img: (H, W) float32 — the *unblurred* level image, as in the reference.
      xy: (N, 2) float32 keypoint centers (x, y).

    Returns: (N,) float32 angles in (-pi, pi].
    """
    wx, wy = _moment_weights()
    patches = extract_patches(img, xy, HALF_PATCH)  # (N, 31, 31)
    m10 = jnp.sum(patches * wx[None], axis=(1, 2))
    m01 = jnp.sum(patches * wy[None], axis=(1, 2))
    return jnp.arctan2(m01, m10)
