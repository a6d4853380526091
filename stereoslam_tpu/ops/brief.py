"""Rotation-steered BRIEF-256 descriptors, packed as 8x uint32.

Replaces the reference's per-keypoint descriptor loop over the hard-coded
``bit_pattern_31_`` table (reference ORBextractor.cpp:58-98, table at
101-359) with a batched formulation: all keypoints x all 256 point pairs are
rotated, sampled and compared in one fused program; the 256 comparison bits
are packed into eight 32-bit words for popcount-based Hamming matching
(see :mod:`stereoslam_tpu.ops.hamming`).

The sampling pattern is *generated*, not copied: 256 coordinate pairs drawn
from the isotropic Gaussian N(0, (patch/5)^2) recommended by the original
BRIEF/ORB papers, with a fixed seed so descriptors are reproducible across
runs and processes.  Descriptors only ever match against other descriptors
from this framework (KF database + loop matching), so pattern identity with
OpenCV is irrelevant — discriminability and determinism are what matter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from stereoslam_tpu.ops.image import _SEL_PRECISION, extract_patches

N_BITS = 256
N_WORDS = 8
PATCH_RADIUS = 13  # sample offsets stay within +/-13 like the reference table


@functools.lru_cache(maxsize=1)
def _pattern():
    """(256, 2, 2) float32: per bit, two (x, y) offsets."""
    rng = np.random.default_rng(20240331)
    sigma = 31.0 / 5.0
    pts = rng.normal(0.0, sigma, size=(N_BITS, 2, 2))
    pts = np.clip(pts, -PATCH_RADIUS, PATCH_RADIUS)
    # numpy (not jnp) so the cache never holds a traced constant.
    return pts.astype(np.float32)


def brief_descriptors(
    img_blurred: jnp.ndarray, xy: jnp.ndarray, angles: jnp.ndarray
) -> jnp.ndarray:
    """Compute steered BRIEF descriptors.

    Args:
      img_blurred: (H, W) float32, Gaussian-blurred level image (the
        reference blurs with sigma=2 before sampling, ORBextractor.cpp:1203).
      xy: (N, 2) float32 centers.
      angles: (N,) float32 orientation in radians.

    Returns: (N, 8) uint32 packed descriptors.
    """
    pat = _pattern()  # (256, 2, 2)
    c = jnp.cos(angles)
    s = jnp.sin(angles)
    # Rotate pattern per keypoint: (N, 256, 2, 2)
    px = pat[None, ..., 0]
    py = pat[None, ..., 1]
    rx = c[:, None, None] * px - s[:, None, None] * py
    ry = s[:, None, None] * px + c[:, None, None] * py

    # Nearest-pixel sampling like the reference's integer-rounded steered
    # pattern (ORBextractor.cpp:72-76); bilinear would smear the comparison.
    # A direct image gather of N x 512 scattered samples dominated keyframe
    # processing on TPU, so sampling goes through per-keypoint patches:
    # extract one (S, S) window per keypoint (one-hot matmuls in
    # extract_patches), then select the 512 rotated offsets inside each
    # patch with a row one-hot matmul + column masked sum — dense MXU/VPU
    # work end to end.
    R = PATCH_RADIUS + 7  # rotated offset <= 13*sqrt(2) ~ 18.4, +1 rounding
    S = 2 * R + 1
    N = xy.shape[0]
    patches = extract_patches(img_blurred, xy, R)  # (N, S, S)
    h, w = img_blurred.shape
    acx = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), R, w - R - 1)
    acy = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), R, h - R - 1)
    # Absolute integer sample positions, then offsets into the patch.
    sx = jnp.round(xy[:, None, None, 0] + rx).astype(jnp.int32)  # (N, 256, 2)
    sy = jnp.round(xy[:, None, None, 1] + ry).astype(jnp.int32)
    ox = jnp.clip(sx - (acx - R)[:, None, None], 0, S - 1).reshape(N, 512)
    oy = jnp.clip(sy - (acy - R)[:, None, None], 0, S - 1).reshape(N, 512)
    rowW = (
        oy[:, :, None] == jnp.arange(S, dtype=jnp.int32)[None, None, :]
    ).astype(patches.dtype)                                        # (N, 512, S)
    t = jnp.einsum("nki,nij->nkj", rowW, patches, precision=_SEL_PRECISION)
    colM = oy[:, :, None] * 0 + jnp.arange(S, dtype=jnp.int32)[None, None, :]
    vals = jnp.sum(jnp.where(colM == ox[:, :, None], t, 0.0), axis=-1)  # (N, 512)
    vals = vals.reshape(N, 256, 2)
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint32)  # (N, 256)

    bits = bits.reshape(bits.shape[0], N_WORDS, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    return jnp.sum(bits << shifts, axis=-1, dtype=jnp.uint32)
