"""Batched linear (DLT) triangulation.

Replaces the reference's per-point SVD triangulation
(reference include/myslam/algorithm.h:16-33): same math — stack the
projection constraints ``u * P3 - P1`` / ``v * P3 - P2`` from each view and
take the null vector of the 4x4 system — but solved for thousands of
feature pairs in one batched call on the MXU, with the same degeneracy
check (last/penultimate singular-value ratio < 1e-2).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from stereoslam_tpu.ops import se3
from stereoslam_tpu.ops.camera import Intrinsics, pixel2camera


def triangulate_pair(
    T_cw_a: jnp.ndarray,
    T_cw_b: jnp.ndarray,
    pn_a: jnp.ndarray,
    pn_b: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Triangulate world points from two views.

    Args:
      T_cw_a, T_cw_b: (..., 4, 4) world->camera transforms for each view.
      pn_a, pn_b:     (..., 3) normalized camera-ray coordinates (z = 1) as
                      produced by :func:`camera.pixel2camera` — the same
                      input convention as the reference's ``triangulation``
                      (algorithm.h:16, called at frontend.cpp:462-470).

    Returns:
      (points_w, good): (..., 3) world points and a (... ,) bool mask that is
      False for degenerate geometry (parallel rays).
    """
    P_a = T_cw_a[..., :3, :]  # (..., 3, 4)
    P_b = T_cw_b[..., :3, :]

    def _rows(P, pn):
        r1 = pn[..., 0:1] * P[..., 2, :] - P[..., 0, :]
        r2 = pn[..., 1:2] * P[..., 2, :] - P[..., 1, :]
        return r1, r2

    a1, a2 = _rows(P_a, pn_a)
    b1, b2 = _rows(P_b, pn_b)
    A = jnp.stack([a1, a2, b1, b2], axis=-2)  # (..., 4, 4)

    # Null vector via eigendecomposition of A^T A (faster than batched SVD on
    # TPU for 4x4 blocks, and equally accurate for the smallest direction).
    AtA = jnp.swapaxes(A, -1, -2) @ A
    eigvals, eigvecs = jnp.linalg.eigh(AtA)  # ascending
    h = eigvecs[..., :, 0]
    w = h[..., 3]
    w_safe = jnp.where(jnp.abs(w) < 1e-10, 1e-10, w)
    p = h[..., :3] / w_safe[..., None]

    # Degeneracy check mirroring algorithm.h:27-30: smallest singular value
    # must be well-separated from the next one (sigma_i = sqrt(eig_i)) — and
    # the next one must itself be non-tiny, otherwise the null space is
    # multi-dimensional (e.g. two identical views) and the point is undefined.
    s0 = jnp.sqrt(jnp.maximum(eigvals[..., 0], 0.0))
    s1 = jnp.sqrt(jnp.maximum(eigvals[..., 1], 1e-20))
    s3 = jnp.sqrt(jnp.maximum(eigvals[..., 3], 1e-20))
    good = ((s0 / s1) < 1e-2) & (s1 > 1e-5 * s3)
    return p, good


def triangulate_stereo(
    px_left: jnp.ndarray,
    px_right: jnp.ndarray,
    T_cw_left: jnp.ndarray,
    T_cw_right: jnp.ndarray,
    intr_left: Intrinsics,
    intr_right: Intrinsics,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stereo-pair convenience wrapper: pixels -> world points + validity.

    Validity additionally requires positive depth in the left camera
    (reference frontend.cpp:472 checks ``pworld[2] > 0`` before inserting a
    map point).
    """
    pn_l = pixel2camera(px_left, intr_left)
    pn_r = pixel2camera(px_right, intr_right)
    p_w, good = triangulate_pair(T_cw_left, T_cw_right, pn_l, pn_r)
    z = se3.act(T_cw_left, p_w)[..., 2]
    return p_w, good & (z > 0.0)
