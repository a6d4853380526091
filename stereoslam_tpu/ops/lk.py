"""Batched pyramidal Lucas–Kanade optical flow.

TPU-native replacement for ``cv::calcOpticalFlowPyrLK`` as used by the
reference's temporal and stereo feature tracking (reference
src/frontend.cpp:150-153 and 355-360: 11x11 window, maxLevel 3, 30
iterations, eps 0.01, OPTFLOW_USE_INITIAL_FLOW).

Instead of OpenCV's per-point scalar loop, all N tracks advance together:
each LK iteration is one batched (N, W*W) bilinear gather + a closed-form
2x2 normal-equation solve per point on the VPU.  The iteration count is
static (lax.fori_loop) with a convergence mask, so the whole tracker jits
into a single XLA program with no host round-trips.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from stereoslam_tpu.ops.image import bilinear_sample


class FlowResult(NamedTuple):
    points: jnp.ndarray  # (N, 2) tracked positions in the next image
    status: jnp.ndarray  # (N,) bool — track considered successful
    error: jnp.ndarray   # (N,) float32 mean |residual| over the window


def _level_impl(window: int) -> str:
    """Select the per-level implementation.  Default is the batched one-hot
    matmul formulation (ops/lk_batched.py) — measured ~20x faster than the
    per-feature Pallas window kernel on v5e (which is itself ~8x faster than
    the jnp gather path there).  Override with STEREOSLAM_LK=jnp|pallas|batched.
    """
    import os

    impl = os.environ.get("STEREOSLAM_LK", "auto")
    if impl in ("jnp", "pallas", "batched"):
        return impl
    # The batched one-hot formulation is window-generic (the Pallas kernel
    # is compiled for one window size; only an explicit STEREOSLAM_LK=pallas
    # selects it, and only at its own window).
    return "batched"


@functools.lru_cache(maxsize=8)
def _window_offsets(window: int):
    # Cached as numpy: caching a jnp array built under a jit trace would leak
    # the tracer into later traces.
    import numpy as np

    r = window // 2
    ys, xs = np.mgrid[-r : r + 1, -r : r + 1]
    return np.stack([xs.ravel(), ys.ravel()], axis=-1).astype(np.float32)  # (W*W, 2)


def _track_level(
    img_prev: jnp.ndarray,
    img_next: jnp.ndarray,
    pts_prev: jnp.ndarray,
    flow: jnp.ndarray,
    window: int,
    iters: int,
    eps: float,
    min_eig: float = 1e-4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One pyramid level of LK refinement.

    Args:
      pts_prev: (N, 2) template centers in img_prev coords (this level).
      flow: (N, 2) current displacement estimate (this level).

    Returns: (flow, good) — refined displacement and conditioning mask.
    """
    offs = _window_offsets(window)  # (K, 2)
    grid = pts_prev[:, None, :] + offs[None]  # (N, K, 2)

    T = bilinear_sample(img_prev, grid)  # (N, K)
    # Template gradients via central differences (constant across iterations —
    # the classic inverse-additive KLT structure matrix).
    dx = jnp.asarray([0.5, 0.0], jnp.float32)
    dy = jnp.asarray([0.0, 0.5], jnp.float32)
    Ix = bilinear_sample(img_prev, grid + dx) - bilinear_sample(img_prev, grid - dx)
    Iy = bilinear_sample(img_prev, grid + dy) - bilinear_sample(img_prev, grid - dy)

    g11 = jnp.sum(Ix * Ix, axis=1)
    g12 = jnp.sum(Ix * Iy, axis=1)
    g22 = jnp.sum(Iy * Iy, axis=1)
    det = g11 * g22 - g12 * g12
    trace = g11 + g22
    # Minimum eigenvalue of G, normalized per pixel like OpenCV's minEigThreshold.
    min_eig_val = (trace - jnp.sqrt(jnp.maximum(trace * trace - 4.0 * det, 0.0))) * 0.5
    good = min_eig_val / (window * window) > min_eig
    det_safe = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    inv11 = g22 / det_safe
    inv12 = -g12 / det_safe
    inv22 = g11 / det_safe

    def body(_, carry):
        flow, converged = carry
        J = bilinear_sample(img_next, grid + flow[:, None, :])  # (N, K)
        r = J - T
        b1 = jnp.sum(r * Ix, axis=1)
        b2 = jnp.sum(r * Iy, axis=1)
        dx_step = -(inv11 * b1 + inv12 * b2)
        dy_step = -(inv12 * b1 + inv22 * b2)
        step = jnp.stack([dx_step, dy_step], axis=-1)
        step = jnp.where((good & ~converged)[:, None], step, 0.0)
        new_flow = flow + step
        new_converged = converged | (jnp.sum(step * step, axis=-1) < eps * eps)
        return new_flow, new_converged

    flow, _ = jax.lax.fori_loop(0, iters, body, (flow, jnp.zeros(flow.shape[0], bool)))
    return flow, good


def _final_error(img_prev, img_next, pts_prev, flow, window) -> jnp.ndarray:
    offs = _window_offsets(window)
    grid = pts_prev[:, None, :] + offs[None]
    T = bilinear_sample(img_prev, grid)
    J = bilinear_sample(img_next, grid + flow[:, None, :])
    return jnp.mean(jnp.abs(J - T), axis=1)


def pyramidal_lk(
    pyr_prev: Sequence[jnp.ndarray],
    pyr_next: Sequence[jnp.ndarray],
    pts_prev: jnp.ndarray,
    pts_init: jnp.ndarray,
    window: int = 11,
    iters: int = 30,
    eps: float = 0.01,
    max_error: float = 30.0,
    forward_backward: float = 0.0,
    fb_iters: int = 10,
    fb_levels: int = 0,
) -> FlowResult:
    """Track points from ``pyr_prev`` to ``pyr_next``.

    Args:
      pyr_prev, pyr_next: power-of-two pyramids (see
        :func:`stereoslam_tpu.ops.image.build_lk_pyramid`), finest first.
      pts_prev: (N, 2) positions in the previous image.
      pts_init: (N, 2) initial guesses in the next image — the reference
        seeds stereo matching with the same position and temporal matching
        with the map-point reprojection (frontend.cpp:134-139), i.e.
        OPTFLOW_USE_INITIAL_FLOW semantics.
      forward_backward: if > 0, re-track the result back into ``pyr_prev``
        and reject tracks whose round trip misses the start by more than
        this many pixels.  Guards against "ghost locks": with a biased
        initial guess, LK can converge onto a lookalike patch that happens
        to agree with the prediction — the round trip exposes it.  (A
        robustness addition over the reference, which relies on its pose
        optimizer's chi2 rounds alone.)

    Returns: :class:`FlowResult`.
    """
    n_levels = len(pyr_prev)
    top = float(2 ** (n_levels - 1))
    flow = (pts_init - pts_prev) / top
    good_all = jnp.ones(pts_prev.shape[0], bool)

    impl = _level_impl(window)
    if impl == "pallas":
        from stereoslam_tpu.ops.lk_pallas import lk_level_pallas
    elif impl == "batched":
        from stereoslam_tpu.ops.lk_batched import track_level_batched

    for lvl in range(n_levels - 1, -1, -1):
        scale = float(2**lvl)
        pts_l = pts_prev / scale
        if impl == "pallas":
            flow, good = lk_level_pallas(
                pyr_prev[lvl], pyr_next[lvl], pts_l, flow, iters=iters, eps=eps,
                interpret=jax.default_backend() == "cpu",
            )
        elif impl == "batched":
            flow, good = track_level_batched(
                pyr_prev[lvl], pyr_next[lvl], pts_l, flow, window, iters, eps
            )
        else:
            flow, good = _track_level(
                pyr_prev[lvl], pyr_next[lvl], pts_l, flow, window, iters, eps
            )
        if lvl == 0:
            # Conditioning only gates at the finest level (as in OpenCV):
            # coarse levels where the patch has no texture simply leave the
            # flow unrefined and defer to finer levels.
            good_all = good_all & good
        if lvl > 0:
            flow = flow * 2.0

    pts_next = pts_prev + flow
    h, w = pyr_next[0].shape
    margin = window // 2
    in_bounds = (
        (pts_next[:, 0] >= margin)
        & (pts_next[:, 0] < w - margin)
        & (pts_next[:, 1] >= margin)
        & (pts_next[:, 1] < h - margin)
    )
    if impl == "batched":
        from stereoslam_tpu.ops.lk_batched import final_error_batched

        err = final_error_batched(pyr_prev[0], pyr_next[0], pts_prev, flow, window)
    else:
        err = _final_error(pyr_prev[0], pyr_next[0], pts_prev, flow, window)
    status = good_all & in_bounds & (err < max_error)

    if forward_backward > 0.0:
        # Backward init = zero flow (NOT the known start, which would bias
        # the check toward confirming the forward result).  Fewer iterations
        # suffice: the backward pass only has to land in the right basin,
        # not converge to sub-pixel precision.  ``fb_levels`` (0 = all)
        # optionally restricts the backward pass to the finest pyramid
        # levels: a ghost lock disagrees with the true motion by many
        # pixels, which the fine levels expose without paying the full
        # coarse-to-fine sweep a second time.
        fb_pyr_next = pyr_next[:fb_levels] if fb_levels > 0 else pyr_next
        fb_pyr_prev = pyr_prev[:fb_levels] if fb_levels > 0 else pyr_prev
        back = pyramidal_lk(
            fb_pyr_next, fb_pyr_prev, pts_next, pts_next,
            window=window, iters=fb_iters, eps=eps, max_error=max_error,
            forward_backward=0.0,
        )
        round_trip = jnp.linalg.norm(back.points - pts_prev, axis=-1)
        status = status & back.status & (round_trip <= forward_backward)
    return FlowResult(points=pts_next, status=status, error=err)
