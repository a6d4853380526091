"""Pallas TPU kernel for one pyramidal-LK level.

The pure-jnp LK (ops/lk.py) spends ~270 ms/frame in XLA gathers: every
iteration bilinearly samples N x 121 scattered pixels from HBM.  This kernel
restructures the computation the TPU way:

- grid over groups of 8 features; each feature's program DMAs a small
  aligned window around it from both images (HBM -> VMEM) once;
- all LK iterations then run on VMEM data as pure vector ops — bilinear
  sampling of a *contiguous* 11x11 patch is expressed as a weighted sum of
  four integer-shifted dynamic slices (no gathers anywhere);
- the per-level flow excursion is bounded by the window margin (the pyramid
  handles large motion, so a +/-10 px bound per level loses nothing).

Numerics match ops/lk.py's `_track_level` (same template-gradient structure
matrix, same convergence rule), so the two paths are interchangeable; tests
compare them directly.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Window geometry: 11x11 LK window, +/-BOUND px of in-level flow excursion,
# bilinear/gradient halo.
WINDOW = 11
BOUND = 10
HALO = 2
TILE_H = 48   # >= WINDOW + 2*(BOUND+HALO) + slack, in sublane tiles (6x8);
              # sized so the aligned 24-row sub-reads below stay in bounds
TILE_W = 256  # two lane tiles: origins must be 128-aligned, features can sit
              # anywhere in the middle half
GROUP = 8     # features per grid step (output sublane alignment)


def _bilinear_patch(buf_ref, y, x, h=WINDOW, w=WINDOW):
    """Sample a contiguous (h, w) patch at float position (y, x) from a VMEM
    buffer ref — pure vector ops, no gathers.

    Mosaic cannot vector-load unaligned sub-tiles at dynamic lane offsets,
    so the extraction is: sublane-dynamic slice of full 128-lane rows, a
    dynamic lane *rotate* to bring column xi to lane 0, then static slicing;
    bilinear weights combine the four integer corners of one (h+1, w+1)
    extract.
    """
    yi = jnp.floor(y).astype(jnp.int32)
    xi = jnp.floor(x).astype(jnp.int32)
    fy = y - yi.astype(y.dtype)
    fx = x - xi.astype(x.dtype)
    # Mosaic constraints drive this extraction dance: sliced vector loads
    # need 8-aligned sublane offsets; lane-axis dynamic rotate works but
    # sublane-axis dynamic rotate miscompiles (verified on v5e).  So: load
    # 24 rows at the aligned offset, rotate lanes to bring column xi to 0,
    # and resolve the sub-tile row remainder with an 8-way static switch.
    yi_al = pl.multiple_of((yi // 8) * 8, 8)
    rem = yi - yi_al
    rows = buf_ref[pl.ds(yi_al, 24), :]            # (24, TILE_W), aligned
    rows = pltpu.roll(rows, -xi, axis=1)           # column xi -> lane 0
    E = jax.lax.switch(
        rem, [lambda r=r: rows[r : r + h + 1, : w + 1] for r in range(8)]
    )                                              # (h+1, w+1)
    p00 = E[:h, :w]
    p01 = E[:h, 1 : w + 1]
    p10 = E[1 : h + 1, :w]
    p11 = E[1 : h + 1, 1 : w + 1]
    return (
        p00 * (1 - fy) * (1 - fx)
        + p01 * (1 - fy) * fx
        + p10 * fy * (1 - fx)
        + p11 * fy * fx
    )


def _one_feature(prev_buf, next_buf, px, py, fx0, fy0, y0, x0, iters, eps, min_eig):
    """LK iterations for one feature whose windows are already in VMEM."""
    r = WINDOW // 2
    ty = py - y0.astype(py.dtype) - r
    tx = px - x0.astype(px.dtype) - r

    # Template + central-difference gradients.  (A single-extract variant
    # with static sub-slices selected by fraction thresholds measured the
    # same speed but miscompiled on v5e Mosaic — keep the per-sample
    # extraction, which is hardware-verified.)
    T = _bilinear_patch(prev_buf, ty, tx)
    Ix = _bilinear_patch(prev_buf, ty, tx + 0.5) - _bilinear_patch(prev_buf, ty, tx - 0.5)
    Iy = _bilinear_patch(prev_buf, ty + 0.5, tx) - _bilinear_patch(prev_buf, ty - 0.5, tx)
    g11 = jnp.sum(Ix * Ix)
    g12 = jnp.sum(Ix * Iy)
    g22 = jnp.sum(Iy * Iy)
    det = g11 * g22 - g12 * g12
    trace = g11 + g22
    min_eig_val = 0.5 * (trace - jnp.sqrt(jnp.maximum(trace * trace - 4.0 * det, 0.0)))
    good = min_eig_val / (WINDOW * WINDOW) > min_eig
    det_safe = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    inv11 = g22 / det_safe
    inv12 = -g12 / det_safe
    inv22 = g11 / det_safe

    lo = jnp.float32(HALO)
    # hi_y guarantees the aligned 24-row read stays inside the buffer:
    # yi <= TILE_H-24 -> yi_al <= TILE_H-24 -> yi_al + 24 <= TILE_H.
    hi_y = jnp.float32(TILE_H - 24)
    hi_x = jnp.float32(TILE_W - WINDOW - HALO - 1)

    # NOTE: an early-exit lax.while_loop variant measured only ~18% faster
    # here (the per-group fori pipeline hides much of the skipped work) and
    # miscompiled on v5e Mosaic (wrong `good` flags) — fori_loop with masked
    # updates is the verified formulation.
    def body(_, carry):
        fx, fy, converged = carry
        jy = jnp.clip(ty + fy, lo, hi_y)
        jx = jnp.clip(tx + fx, lo, hi_x)
        J = _bilinear_patch(next_buf, jy, jx)
        rdiff = J - T
        b1 = jnp.sum(rdiff * Ix)
        b2 = jnp.sum(rdiff * Iy)
        dx = -(inv11 * b1 + inv12 * b2)
        dy = -(inv12 * b1 + inv22 * b2)
        step_ok = jnp.logical_and(good, jnp.logical_not(converged))
        dx = jnp.where(step_ok, dx, 0.0)
        dy = jnp.where(step_ok, dy, 0.0)
        fx = jnp.clip(fx + dx, fx0 - BOUND, fx0 + BOUND)
        fy = jnp.clip(fy + dy, fy0 - BOUND, fy0 + BOUND)
        converged = jnp.logical_or(converged, dx * dx + dy * dy < eps * eps)
        return fx, fy, converged

    fx, fy, _ = jax.lax.fori_loop(0, iters, body, (fx0, fy0, jnp.bool_(False)))
    return fx, fy, jnp.where(good, 1.0, 0.0)


def _lk_kernel(
    origin_ref,      # (N, 2) int32 scalar-prefetch — window origin (y0, x0)
    prev_hbm,        # (H, W) f32 in ANY/HBM
    next_hbm,
    pts_ref,         # (N, 2) f32 VMEM
    flow_ref,        # (N, 2) f32 VMEM
    out_ref,         # (GROUP, 4) f32 block: [flow_x, flow_y, good, 0]
    prev_buf, next_buf, sems,
    *,
    iters: int,
    eps: float,
    min_eig: float,
):
    g = pl.program_id(0)

    def per_feature(k, acc):
        i = g * GROUP + k
        # DMA source offsets must be provably tile-aligned (8, 128).
        y0 = pl.multiple_of(origin_ref[i, 0], 8)
        x0 = pl.multiple_of(origin_ref[i, 1], 128)
        cp_prev = pltpu.make_async_copy(
            prev_hbm.at[pl.ds(y0, TILE_H), pl.ds(x0, TILE_W)], prev_buf, sems.at[0]
        )
        cp_next = pltpu.make_async_copy(
            next_hbm.at[pl.ds(y0, TILE_H), pl.ds(x0, TILE_W)], next_buf, sems.at[1]
        )
        cp_prev.start()
        cp_next.start()
        px = pts_ref[i, 0]
        py = pts_ref[i, 1]
        fx0 = flow_ref[i, 0]
        fy0 = flow_ref[i, 1]
        cp_prev.wait()
        cp_next.wait()
        fx, fy, goodf = _one_feature(
            prev_buf, next_buf, px, py, fx0, fy0, y0, x0, iters, eps, min_eig
        )
        row = jnp.stack([fx, fy, goodf, jnp.float32(0.0)])
        # Row write via iota select (scatter is not lowerable in Mosaic).
        row_mask = jax.lax.broadcasted_iota(jnp.int32, (GROUP, 4), 0) == k
        return jnp.where(row_mask, jnp.broadcast_to(row, (GROUP, 4)), acc)

    acc = jnp.zeros((GROUP, 4), jnp.float32)
    acc = jax.lax.fori_loop(0, GROUP, per_feature, acc)
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("iters", "eps", "min_eig", "interpret"))
def lk_level_pallas(
    img_prev: jnp.ndarray,
    img_next: jnp.ndarray,
    pts: jnp.ndarray,
    flow: jnp.ndarray,
    iters: int = 30,
    eps: float = 0.01,
    min_eig: float = 1e-4,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One LK level for all N features.  Returns (flow (N,2), good (N,))."""
    N = pts.shape[0]
    Np = -(-N // GROUP) * GROUP
    if Np != N:
        pad = Np - N
        pts = jnp.concatenate([pts, jnp.full((pad, 2), 64.0, pts.dtype)])
        flow = jnp.concatenate([flow, jnp.zeros((pad, 2), flow.dtype)])
    # Pad images (edge-replicated) so that EVERY feature position admits an
    # aligned window origin keeping it inside the buffer's usable band:
    # 16 rows / 128 cols on the top/left lift border features into the band
    # (cy >= 16, cx >= 128 after the shift); the bottom/right padding sizes
    # the clip ranges of y0 = (cy-16)//8*8 and x0 = (cx-96)//128*128.
    PAD_T, PAD_L = 16, 128
    H, W = img_prev.shape
    Ht, Wt = H + PAD_T, W + PAD_L
    Hp = max((max(Ht - 17, 0) // 8) * 8 + TILE_H, TILE_H)
    Wp = max((max(Wt - 97, 0) // 128) * 128 + TILE_W, TILE_W)
    img_prev = jnp.pad(img_prev, ((PAD_T, Hp - Ht), (PAD_L, Wp - Wt)), mode="edge")
    img_next = jnp.pad(img_next, ((PAD_T, Hp - Ht), (PAD_L, Wp - Wt)), mode="edge")
    pts = pts + jnp.asarray([PAD_L, PAD_T], pts.dtype)  # flow is shift-invariant
    H, W = Hp, Wp
    r = WINDOW // 2

    # Window origin: centred between template and predicted target so both
    # fit with room for the BOUND excursion, aligned down to the (8, 128)
    # HBM tiling the DMA engine requires.
    cy = jnp.round(pts[:, 1] + 0.5 * flow[:, 1]).astype(jnp.int32)
    cx = jnp.round(pts[:, 0] + 0.5 * flow[:, 0]).astype(jnp.int32)
    # cy - y0 lands in [16, 23] and cx - x0 in [96, 223] (below when the
    # feature is near the top/left edge) — inside the buffer's usable band.
    y0 = jnp.clip((cy - 16) // 8 * 8, 0, max((H - TILE_H) // 8 * 8, 0))
    x0 = jnp.clip((cx - 96) // 128 * 128, 0, max((W - TILE_W) // 128 * 128, 0))
    origins = jnp.stack([y0, x0], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Np // GROUP,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((GROUP, 4), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_lk_kernel, iters=iters, eps=eps, min_eig=min_eig)
    (out,) = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((Np, 4), jnp.float32)],
        grid_spec=grid_spec,
        interpret=interpret,
    )(origins, img_prev, img_next, pts, flow)
    return out[:N, :2], out[:N, 2] > 0.5
