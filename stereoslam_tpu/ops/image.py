"""Image raster primitives: separable Gaussian blur, pyramids, bilinear sampling.

These replace the OpenCV raster calls the reference leans on
(``cv::GaussianBlur`` in ORBextractor.cpp:1203 / deeplcd.cpp:47,
``cv::resize`` in ORBextractor.cpp:1242, and the implicit bilinear
interpolation inside ``cv::calcOpticalFlowPyrLK``) with fused XLA ops that
operate on whole images and batched sample grids.

Images are ``(H, W)`` float32 arrays in [0, 255].
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=16)
def _gaussian_taps(sigma: float, radius: int) -> tuple:
    xs = [math.exp(-0.5 * (i / sigma) ** 2) for i in range(-radius, radius + 1)]
    s = sum(xs)
    return tuple(x / s for x in xs)


def gaussian_blur(
    img: jnp.ndarray,
    sigma: float = 2.0,
    radius: int = 3,
    sigma_x: float | None = None,
    radius_x: int | None = None,
) -> jnp.ndarray:
    """Separable Gaussian blur with edge replication.

    Matches the role of ``cv::GaussianBlur(image, 7, 7, 2, 2, BORDER_REFLECT)``
    used before BRIEF sampling (reference ORBextractor.cpp:1200-1205).
    Implemented as 2x(2r+1) shifted adds so XLA fuses it into a single
    vectorized pass — no conv dim juggling for a single-channel image.

    ``sigma_x``/``radius_x``: optional separate horizontal-axis kernel
    (anisotropic blur — used for aspect-correct anti-aliasing before a
    non-uniform downscale); defaults to the vertical one.
    """
    taps = _gaussian_taps(float(sigma), int(radius))
    taps_x = (
        _gaussian_taps(float(sigma_x), int(radius_x))
        if sigma_x is not None
        else taps
    )
    pad = radius
    pad_x = int(radius_x) if radius_x is not None else pad
    padded = jnp.pad(img, ((pad, pad), (0, 0)), mode="edge")
    h, w = img.shape
    out = jnp.zeros_like(img)
    for i, t in enumerate(taps):
        out = out + t * jax.lax.dynamic_slice(padded, (i, 0), (h, w))
    out2 = jnp.zeros_like(img)
    padded2 = jnp.pad(out, ((0, 0), (pad_x, pad_x)), mode="edge")
    for i, t in enumerate(taps_x):
        out2 = out2 + t * jax.lax.dynamic_slice(padded2, (0, i), (h, w))
    return out2


def pyramid_shapes(h: int, w: int, n_levels: int, scale_factor: float) -> Tuple[Tuple[int, int], ...]:
    shapes = []
    for lvl in range(n_levels):
        s = scale_factor ** lvl
        shapes.append((max(8, int(round(h / s))), max(8, int(round(w / s)))))
    return tuple(shapes)


def _resize_weights(n_out: int, n_in: int, dtype) -> jnp.ndarray:
    """(n_in, n_out) two-tap bilinear interpolation matrix (align_corners
    False / half-pixel centers, matching jax.image.resize 'bilinear' for
    downscale factors <= 2 and cv::resize INTER_LINEAR)."""
    scale = n_in / n_out
    centers = (jnp.arange(n_out, dtype=dtype) + 0.5) * scale - 0.5
    lo = jnp.clip(jnp.floor(centers), 0, n_in - 1)
    frac = jnp.clip(centers - lo, 0.0, 1.0)
    hi = jnp.minimum(lo + 1, n_in - 1)
    rows = jnp.arange(n_in, dtype=dtype)[:, None]
    return (rows == lo[None, :]) * (1.0 - frac[None, :]) + (rows == hi[None, :]) * frac[None, :]


def resize_bilinear(img: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize as two matmuls (MXU).

    Replaces ``jax.image.resize(..., 'bilinear')``: its general gather-based
    lowering on TPU is schedule-sensitive — the same program was measured
    anywhere between 0.03 ms and 80 ms depending on the surrounding
    executable.  Two dense two-tap interpolation matmuls lower the same math
    deterministically onto the MXU.
    """
    h2, w2 = shape
    h, w = img.shape
    Wh = _resize_weights(h2, h, img.dtype)   # (h, h2)
    Ww = _resize_weights(w2, w, img.dtype)   # (w, w2)
    out = jnp.dot(Wh.T, img, precision=jax.lax.Precision.HIGHEST)
    return jnp.dot(out, Ww, precision=jax.lax.Precision.HIGHEST)


def build_pyramid(img: jnp.ndarray, n_levels: int, scale_factor: float) -> Tuple[jnp.ndarray, ...]:
    """Image pyramid with the reference's 1.2x level spacing
    (ORBextractor.cpp:1229-1265).  Level 0 is the input image; each level is
    bilinearly resized from the previous one, like cv::resize(INTER_LINEAR).
    All shapes are static so the pyramid is one jittable tuple pytree.
    """
    shapes = pyramid_shapes(img.shape[0], img.shape[1], n_levels, scale_factor)
    levels = [img]
    for lvl in range(1, n_levels):
        levels.append(resize_bilinear(levels[-1], shapes[lvl]))
    return tuple(levels)


def halve(img: jnp.ndarray) -> jnp.ndarray:
    """2x downsample by 2x2 averaging (the classic LK pyramid reduction).

    TPU note: lane-strided slicing (``img[:, 0::2]``) lowers to expensive
    lane shuffles, so rows are paired with a sublane-cheap reshape-sum and
    columns with a two-hot averaging matmul on the MXU.
    """
    h2, w2 = img.shape[0] // 2, img.shape[1] // 2
    img = img[: h2 * 2, : w2 * 2]
    rows = img.reshape(h2, 2, w2 * 2).sum(axis=1)          # (h2, 2*w2)
    cols = jnp.arange(2 * w2, dtype=jnp.int32)[:, None] // 2
    Dw = 0.25 * (cols == jnp.arange(w2, dtype=jnp.int32)[None, :]).astype(img.dtype)
    return jnp.dot(rows, Dw, precision=jax.lax.Precision.HIGHEST)


def build_lk_pyramid(img: jnp.ndarray, n_levels: int) -> Tuple[jnp.ndarray, ...]:
    """Power-of-two pyramid for pyramidal LK (cv::buildOpticalFlowPyramid)."""
    levels = [img]
    for _ in range(1, n_levels):
        levels.append(halve(levels[-1]))
    return tuple(levels)


def bilinear_sample(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear interpolation of ``img`` at float coordinates.

    Args:
      img: (H, W) float32.
      xy:  (..., 2) float32 pixel coordinates as (x, y).  Out-of-bounds
           coordinates are clamped (callers mask separately).

    Returns: (...,) float32 samples.
    """
    h, w = img.shape
    x = jnp.clip(xy[..., 0], 0.0, w - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    Ia = img[y0, x0]
    Ib = img[y0, x1]
    Ic = img[y1, x0]
    Id = img[y1, x1]
    return (
        Ia * (1 - fx) * (1 - fy)
        + Ib * fx * (1 - fy)
        + Ic * (1 - fx) * fy
        + Id * fx * fy
    )


# Precision for one-hot selection matmuls.  DEFAULT (single-pass bf16)
# rounds the selected pixel values by ~2^-8 relative — far below every
# consumer's tolerance (FAST thresholds >= 7, IC-angle moments average ~700
# pixels, BRIEF compares well-separated smoothed values) and ~6x faster than
# the exact path.  Override with STEREOSLAM_SELECT_PRECISION=highest.
import os as _os

_SEL_PRECISION = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}[_os.environ.get("STEREOSLAM_SELECT_PRECISION", "default")]


def extract_patches(img: jnp.ndarray, centers_xy: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Square (2r+1)^2 patches around integer centers, via one-hot matmuls.

    A vmapped dynamic_slice lowers to a scattered HBM gather on TPU — this
    exact call pattern measured ~2 ms per 200k samples and dominated keyframe
    descriptor extraction.  Row/column one-hot selection matmuls compute the
    same patches as dense MXU work.

    Args:
      img: (H, W).
      centers_xy: (N, 2) float or int (x, y); rounded and clamped so the
        patch stays in-bounds.

    Returns: (N, 2r+1, 2r+1).
    """
    size = 2 * radius + 1
    h, w = img.shape
    cx = jnp.clip(jnp.round(centers_xy[:, 0]).astype(jnp.int32), radius, w - radius - 1)
    cy = jnp.clip(jnp.round(centers_xy[:, 1]).astype(jnp.int32), radius, h - radius - 1)
    rows = (cy - radius)[:, None] + jnp.arange(size, dtype=jnp.int32)[None, :]
    rowW = (rows[:, :, None] == jnp.arange(h, dtype=jnp.int32)[None, None, :]).astype(img.dtype)
    band = jnp.einsum("nsh,hw->nsw", rowW, img, precision=_SEL_PRECISION)
    cols = (cx - radius)[:, None] + jnp.arange(size, dtype=jnp.int32)[None, :]
    colW = (cols[:, :, None] == jnp.arange(w, dtype=jnp.int32)[None, None, :]).astype(img.dtype)
    return jnp.einsum("nsw,ntw->nst", band, colW, precision=_SEL_PRECISION)
