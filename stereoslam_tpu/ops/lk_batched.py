"""Batched one-hot-matmul LK level: all features in parallel on the MXU/VPU.

Third (and fastest) formulation of one pyramidal-LK level, alongside the
gather-based jnp path (ops/lk.py `_track_level`) and the per-feature Pallas
window kernel (ops/lk_pallas.py).  The Pallas kernel fixed the jnp path's
HBM-gather problem but processes features *serially* inside the grid with
11x11-patch arithmetic — ~1% VPU lane utilization, measured ~33 ms/frame on
v5e.  This module restructures the level the TPU way:

- **Patch extraction as one-hot matmuls** (once per level, not per
  iteration): each feature's (S, S) neighborhood is pulled out of the image
  by two einsums — a row-selection one-hot against the image, then a
  batched column-selection one-hot.  Dense MXU work; no gathers, no
  per-feature DMA serialization.
- **Template + gradients as static-shift bilinear**: patch anchors absorb
  the integer part of each feature's position, so the remaining sub-pixel
  offset is in [0, 1) and template sampling is a 4-tap weighted sum of
  statically shifted patch slices (pure VPU, lanes = features x window).
- **Per-iteration sampling as two-hot matmuls**: the flow update moves the
  sample point by an arbitrary (bounded) offset inside the patch, so each
  iteration bilinearly samples the target window with per-feature
  *weighted* row/column selection matrices ("two-hot": weight w at
  floor(q), 1-w at floor(q)+1) — two tiny batched matmuls, fully
  lane-parallel over features.

Numerics match ops/lk.py `_track_level` (same inverse-compositional
structure matrix, same convergence rule, same OpenCV-style minEigThreshold
gate); edge handling replicates border pixels (the jnp path clamps sample
coordinates, which is equivalent up to the final 0.001 px of the border).
The per-level flow excursion is bounded by the patch margin (±BOUND px, as
in the Pallas kernel): the pyramid absorbs large motion, so this loses
nothing in practice.

Replaces the hot path of ``cv::calcOpticalFlowPyrLK`` (reference
src/frontend.cpp:150-153, 355-360) — see ops/lk.py for the full pyramid
driver, which selects this level implementation by default.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# Patch geometry.  BOUND is the per-level flow excursion allowed before the
# sample window would leave the extracted patch; the update rule clips to it.
BOUND = 12

# Selection-matmul precision.  DEFAULT (single-pass bf16 on the MXU) rounds
# image intensities by ~2^-8 relative (~0.25 at 8-bit scale) — far below the
# texture contrast LK needs, and measured to change converged flows by well
# under 0.01 px on KITTI-scale imagery, while running the einsums ~6x faster
# than HIGHEST.  Override with STEREOSLAM_LK_PRECISION=highest if an exact
# f32 path is ever needed (CPU ignores this entirely).
import os as _os

_PEX = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}[_os.environ.get("STEREOSLAM_LK_PRECISION", "default")]


def _patch_sizes(window: int) -> Tuple[int, int]:
    r = window // 2
    # Template patch: window + bilinear tap + ±0.5 gradient taps.
    s_t = 2 * r + 4
    # Target patch: window + bilinear tap + ±BOUND excursion + 1 slack.
    s_j = 2 * (r + BOUND + 2)
    return s_t, s_j


def _extract_patches(img: jnp.ndarray, ay: jnp.ndarray, ax: jnp.ndarray, S: int):
    """(N, S, S) patches with top-left corners (ay, ax), edge-replicated.

    Two one-hot einsums: rows against the image (shared contraction over H),
    then batched column selection.  Row/column indices are clipped, so
    out-of-image patch pixels replicate the border row/column — matching the
    clamp semantics of ops/image.py `bilinear_sample`.
    """
    H, W = img.shape
    rows = jnp.clip(ay[:, None] + jnp.arange(S)[None, :], 0, H - 1)  # (N, S)
    rowW = (rows[:, :, None] == jnp.arange(H)[None, None, :]).astype(img.dtype)
    band = jnp.einsum("nsh,hw->nsw", rowW, img, precision=_PEX)      # (N, S, W)
    cols = jnp.clip(ax[:, None] + jnp.arange(S)[None, :], 0, W - 1)  # (N, S)
    colW = (cols[:, :, None] == jnp.arange(W)[None, None, :]).astype(img.dtype)
    return jnp.einsum("nsw,ntw->nst", band, colW, precision=_PEX)    # (N, S, S)


def _sample_frac(P: jnp.ndarray, oy: jnp.ndarray, ox: jnp.ndarray, window: int,
                 base_y: int, base_x: int):
    """Bilinear window sample at in-patch offsets with static integer parts.

    oy, ox: (N,) in-patch window-center offsets whose integer parts equal the
    static ``base_y``/``base_x`` (callers guarantee this).
    Returns (N, window, window).
    """
    fy = (oy - base_y)[:, None, None]
    fx = (ox - base_x)[:, None, None]
    r = window // 2
    by = base_y - r
    bx = base_x - r
    w = window
    p00 = jax.lax.dynamic_slice(P, (0, by, bx), (P.shape[0], w, w))
    p01 = jax.lax.dynamic_slice(P, (0, by, bx + 1), (P.shape[0], w, w))
    p10 = jax.lax.dynamic_slice(P, (0, by + 1, bx), (P.shape[0], w, w))
    p11 = jax.lax.dynamic_slice(P, (0, by + 1, bx + 1), (P.shape[0], w, w))
    return (p00 * (1 - fy) * (1 - fx) + p01 * (1 - fy) * fx
            + p10 * fy * (1 - fx) + p11 * fy * fx)


def _sample_dynamic(P: jnp.ndarray, oy: jnp.ndarray, ox: jnp.ndarray, window: int):
    """Bilinear window sample at arbitrary in-patch offsets via two-hot matmuls.

    P: (N, S, S); oy, ox: (N,) window-center offsets in patch coordinates.
    Builds per-feature weighted selection matrices (two taps per output row/
    column carrying the bilinear weights) and contracts:
        J = rowW @ P @ colW^T  per feature.
    Returns (N, window, window).
    """
    N, S, _ = P.shape
    r = window // 2
    qy = oy[:, None] + jnp.arange(-r, r + 1, dtype=P.dtype)[None, :]   # (N, w)
    qx = ox[:, None] + jnp.arange(-r, r + 1, dtype=P.dtype)[None, :]
    iy = jnp.floor(qy)
    ix = jnp.floor(qx)
    fy = (qy - iy)[:, :, None]
    fx = (qx - ix)[:, :, None]
    s_iota = jnp.arange(S, dtype=P.dtype)[None, None, :]
    rowW = (s_iota == iy[:, :, None]) * (1 - fy) + (s_iota == iy[:, :, None] + 1) * fy
    colW = (s_iota == ix[:, :, None]) * (1 - fx) + (s_iota == ix[:, :, None] + 1) * fx
    tmp = jnp.einsum("nis,nst->nit", rowW, P, precision=_PEX)          # (N, w, S)
    return jnp.einsum("nit,njt->nij", tmp, colW, precision=_PEX)       # (N, w, w)


def final_error_batched(
    img_prev: jnp.ndarray,
    img_next: jnp.ndarray,
    pts_prev: jnp.ndarray,
    flow: jnp.ndarray,
    window: int,
) -> jnp.ndarray:
    """Mean |J - T| over the window at the converged flow — the batched
    (matmul-selection) equivalent of ops/lk.py `_final_error`, whose
    per-sample gathers dominate LK wall-time on TPU if left in place."""
    s_t, _ = _patch_sizes(window)
    r = window // 2
    px, py = pts_prev[:, 0], pts_prev[:, 1]
    ayT = jnp.floor(py).astype(jnp.int32) - (r + 1)
    axT = jnp.floor(px).astype(jnp.int32) - (r + 1)
    PT = _extract_patches(img_prev, ayT, axT, s_t)
    T = _sample_frac(PT, py - ayT.astype(py.dtype), px - axT.astype(px.dtype),
                     window, base_y=r + 1, base_x=r + 1)
    qx, qy = px + flow[:, 0], py + flow[:, 1]
    ayN = jnp.floor(qy).astype(jnp.int32) - (r + 1)
    axN = jnp.floor(qx).astype(jnp.int32) - (r + 1)
    PN = _extract_patches(img_next, ayN, axN, s_t)
    J = _sample_frac(PN, qy - ayN.astype(qy.dtype), qx - axN.astype(qx.dtype),
                     window, base_y=r + 1, base_x=r + 1)
    return jnp.mean(jnp.abs(J - T), axis=(1, 2))


def track_level_batched(
    img_prev: jnp.ndarray,
    img_next: jnp.ndarray,
    pts_prev: jnp.ndarray,
    flow: jnp.ndarray,
    window: int,
    iters: int,
    eps: float,
    min_eig: float = 1e-4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One LK level for all N features at once.  Drop-in for `_track_level`."""
    s_t, s_j = _patch_sizes(window)
    r = window // 2
    px, py = pts_prev[:, 0], pts_prev[:, 1]

    # --- template patches + gradients (fixed across iterations) -----------
    ayT = jnp.floor(py).astype(jnp.int32) - (r + 1)
    axT = jnp.floor(px).astype(jnp.int32) - (r + 1)
    PT = _extract_patches(img_prev, ayT, axT, s_t)
    oyT = py - ayT.astype(py.dtype)   # in [r+1, r+2)
    oxT = px - axT.astype(px.dtype)
    T = _sample_frac(PT, oyT, oxT, window, base_y=r + 1, base_x=r + 1)
    # ±0.5 gradient taps: floor(o ± 0.5) is r+1 or r+2 depending on the
    # sub-pixel fraction — compute both static variants and select.
    def grad(axis):
        if axis == 0:
            lo_a = _sample_frac(PT, oyT - 0.5, oxT, window, base_y=r, base_x=r + 1)
            lo_b = _sample_frac(PT, oyT - 0.5, oxT, window, base_y=r + 1, base_x=r + 1)
            hi_a = _sample_frac(PT, oyT + 0.5, oxT, window, base_y=r + 1, base_x=r + 1)
            hi_b = _sample_frac(PT, oyT + 0.5, oxT, window, base_y=r + 2, base_x=r + 1)
            f = (oyT - jnp.floor(oyT))[:, None, None]
        else:
            lo_a = _sample_frac(PT, oyT, oxT - 0.5, window, base_y=r + 1, base_x=r)
            lo_b = _sample_frac(PT, oyT, oxT - 0.5, window, base_y=r + 1, base_x=r + 1)
            hi_a = _sample_frac(PT, oyT, oxT + 0.5, window, base_y=r + 1, base_x=r + 1)
            hi_b = _sample_frac(PT, oyT, oxT + 0.5, window, base_y=r + 1, base_x=r + 2)
            f = (oxT - jnp.floor(oxT))[:, None, None]
        lo = jnp.where(f >= 0.5, lo_b, lo_a)
        hi = jnp.where(f >= 0.5, hi_b, hi_a)
        return hi - lo

    Iy = grad(0)
    Ix = grad(1)

    g11 = jnp.sum(Ix * Ix, axis=(1, 2))
    g12 = jnp.sum(Ix * Iy, axis=(1, 2))
    g22 = jnp.sum(Iy * Iy, axis=(1, 2))
    det = g11 * g22 - g12 * g12
    trace = g11 + g22
    min_eig_val = (trace - jnp.sqrt(jnp.maximum(trace * trace - 4.0 * det, 0.0))) * 0.5
    good = min_eig_val / (window * window) > min_eig
    det_safe = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    inv11 = g22 / det_safe
    inv12 = -g12 / det_safe
    inv22 = g11 / det_safe

    # --- target patches, anchored at the initial flow estimate ------------
    flow0 = flow
    cy = py + flow0[:, 1]
    cx = px + flow0[:, 0]
    half = s_j // 2
    ayJ = jnp.floor(cy).astype(jnp.int32) - half + 1
    axJ = jnp.floor(cx).astype(jnp.int32) - half + 1
    PJ = _extract_patches(img_next, ayJ, axJ, s_j)

    def body(carry):
        it, fl, converged = carry
        oy = py + fl[:, 1] - ayJ.astype(py.dtype)
        ox = px + fl[:, 0] - axJ.astype(px.dtype)
        J = _sample_dynamic(PJ, oy, ox, window)
        rdiff = J - T
        b1 = jnp.sum(rdiff * Ix, axis=(1, 2))
        b2 = jnp.sum(rdiff * Iy, axis=(1, 2))
        dx = -(inv11 * b1 + inv12 * b2)
        dy = -(inv12 * b1 + inv22 * b2)
        step = jnp.stack([dx, dy], axis=-1)
        step = jnp.where((good & ~converged)[:, None], step, 0.0)
        new_flow = fl + step
        # Stay inside the extracted patch (the pyramid handles large motion).
        new_flow = jnp.clip(new_flow, flow0 - BOUND, flow0 + BOUND)
        new_converged = converged | (jnp.sum(step * step, axis=-1) < eps * eps)
        return it + 1, new_flow, new_converged

    # Early-exit while_loop: with reprojection-seeded priors most frames
    # converge in a handful of iterations — a fixed 30-iteration fori would
    # pay full price every frame.  `iters` stays the hard cap (OpenCV
    # TermCriteria semantics).
    def cond(carry):
        it, _, converged = carry
        return jnp.logical_and(it < iters, jnp.logical_not(jnp.all(converged)))

    _, flow, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), flow, ~good)
    )
    return flow, good
