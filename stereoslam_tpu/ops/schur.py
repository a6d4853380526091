"""Batched sliding-window bundle adjustment with Schur-complement elimination.

TPU-native replacement for the reference backend's g2o Levenberg–Marquardt
over the active map (reference src/backend.cpp:126-269: pose vertices for
the ≤7 active keyframes, marginalized landmark vertices with CSparse, Huber
kernels, 5 rounds x 10 iterations with chi2-based outlier re-classification).

The g2o graph build + sparse solve is replaced by dense masked tensor
algebra sized for the window:

- observations live in a fixed (W, N) layout (window slot x feature slot) —
  no edge lists;
- the landmark Hessian C is block-diagonal (3x3 closed-form inverses);
- the camera-camera coupling S = B - E C^-1 E^T is one einsum over the
  (W, C, 6, 3) landmark-to-camera strip — an MXU contraction;
- the reduced 6W x 6W system is solved densely (42x42 for W=7).

Landmarks whose first observer is outside the window are held fixed
(backend.cpp:175-177), which also pins the gauge exactly as the reference
does (it fixes no pose vertex).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from stereoslam_tpu.ops import se3
from stereoslam_tpu.ops.camera import Intrinsics


class BAProblem(NamedTuple):
    """Fixed-shape windowed BA problem.

    Shapes: W window slots, N feature slots per KF, C landmark slots.
    """

    cam_T: jnp.ndarray      # (W, 4, 4) initial poses (T_cw)
    cam_valid: jnp.ndarray  # (W,) bool
    cam_fixed: jnp.ndarray  # (W,) bool — pose held constant (gauge anchor);
                            # its observations still constrain landmarks
    lm_pos: jnp.ndarray     # (C, 3) compacted landmark positions
    lm_valid: jnp.ndarray   # (C,) bool
    lm_fixed: jnp.ndarray   # (C,) bool — constraint-only landmarks
    obs_px: jnp.ndarray     # (W, N, 2) measurements
    obs_lm: jnp.ndarray     # (W, N) int32 — landmark slot in [0, C) (compacted)
    obs_valid: jnp.ndarray  # (W, N) bool


class BAResult(NamedTuple):
    cam_T: jnp.ndarray      # (W, 4, 4) optimized poses
    lm_pos: jnp.ndarray     # (C, 3) optimized landmarks
    obs_inlier: jnp.ndarray  # (W, N) bool — final chi2-based classification
    chi2: jnp.ndarray       # (W, N) final squared reprojection errors


def _project_px(cam_T, lm_pos, obs_lm, intr: Intrinsics):
    """Projection only (cost evaluation) — no Jacobian work."""
    P_w = lm_pos[obs_lm]
    R = cam_T[:, None, :3, :3]
    t = cam_T[:, None, :3, 3]
    P_c = jnp.einsum("wnij,wnj->wni", jnp.broadcast_to(R, P_w.shape[:2] + (3, 3)), P_w) + t
    Z = jnp.where(jnp.abs(P_c[..., 2]) < 1e-6, 1e-6, P_c[..., 2])
    u = intr.fx * P_c[..., 0] / Z + intr.cx
    v = intr.fy * P_c[..., 1] / Z + intr.cy
    return jnp.stack([u, v], axis=-1)


def _project_all(cam_T, lm_pos, obs_lm, intr: Intrinsics):
    """Project every observation; return residual pieces and Jacobians.

    Returns px_hat (W,N,2), J_c (W,N,2,6), J_p (W,N,2,3).
    """
    P_w = lm_pos[obs_lm]                       # (W, N, 3)
    R = cam_T[:, None, :3, :3]                 # (W, 1, 3, 3)
    t = cam_T[:, None, :3, 3]
    P_c = jnp.einsum("wnij,wnj->wni", jnp.broadcast_to(R, P_w.shape[:2] + (3, 3)), P_w) + t
    X, Y, Z = P_c[..., 0], P_c[..., 1], P_c[..., 2]
    Z = jnp.where(jnp.abs(Z) < 1e-6, 1e-6, Z)
    Zi = 1.0 / Z
    Zi2 = Zi * Zi
    u = intr.fx * X * Zi + intr.cx
    v = intr.fy * Y * Zi + intr.cy
    px_hat = jnp.stack([u, v], axis=-1)

    du = jnp.stack([intr.fx * Zi, jnp.zeros_like(Z), -intr.fx * X * Zi2], axis=-1)
    dv = jnp.stack([jnp.zeros_like(Z), intr.fy * Zi, -intr.fy * Y * Zi2], axis=-1)
    dpx_dPc = jnp.stack([du, dv], axis=-2)     # (W, N, 2, 3)

    # Camera: left-multiplicative twist [v, w] -> dPc/dxi = [I | -hat(Pc)].
    eye = jnp.broadcast_to(jnp.eye(3, dtype=P_c.dtype), P_c.shape[:2] + (3, 3))
    dPc_dxi = jnp.concatenate([eye, -se3.hat(P_c)], axis=-1)  # (W, N, 3, 6)
    J_c = dpx_dPc @ dPc_dxi                    # (W, N, 2, 6)
    # Landmark: dPc/dX_w = R_cw.
    J_p = dpx_dPc @ jnp.broadcast_to(R, P_c.shape[:2] + (3, 3))  # (W, N, 2, 3)
    return px_hat, J_c, J_p


def _inv3x3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form batched 3x3 inverse via adjugate (C is SPD + damped)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), (b * f - c * e)], axis=-1),
            jnp.stack([B, (a * i - c * g), -(a * f - c * d)], axis=-1),
            jnp.stack([C, -(a * h - b * g), (a * e - b * d)], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def _huber_w(chi2: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IRLS weight for g2o's RobustKernelHuber with setDelta(delta)
    (linear beyond chi2 > delta^2, backend.cpp:199-201)."""
    d2 = delta * delta
    return jnp.where(chi2 <= d2, 1.0, jnp.sqrt(d2 / jnp.maximum(chi2, 1e-12)))


def _robust_cost(chi2: jnp.ndarray, delta: float) -> jnp.ndarray:
    d2 = delta * delta
    return jnp.where(chi2 <= d2, chi2, 2.0 * jnp.sqrt(d2 * chi2) - d2)


def solve_window_ba(
    prob: BAProblem,
    intr: Intrinsics,
    rounds: int = 5,
    iters: int = 10,
    chi2_threshold: float = 5.991,
    huber_delta: float = 5.991,
    damping0: float = 1e-3,
) -> BAResult:
    """Windowed BA with the reference's outlier schedule."""
    W, N = prob.obs_valid.shape
    C = prob.lm_pos.shape[0]
    lm_free = prob.lm_valid & ~prob.lm_fixed

    base_valid = (
        prob.obs_valid
        & prob.cam_valid[:, None]
        & prob.lm_valid[prob.obs_lm]
    )

    def chi2_of(cam_T, lm_pos):
        px_hat = _project_px(cam_T, lm_pos, prob.obs_lm, intr)
        r = prob.obs_px - px_hat
        return jnp.sum(r * r, axis=-1)

    # Slot-selection matrices for the landmark reductions.  segment_sum
    # lowers to scatter-add on TPU (serialized, slow); the same reduction as
    # a one-hot matmul runs on the MXU and — being iteration-invariant — is
    # built once here and reused by every LM iteration.
    flat_lm_all = prob.obs_lm.reshape(-1)                              # (W*N,)
    sel_flat = (
        flat_lm_all[None, :] == jnp.arange(C, dtype=jnp.int32)[:, None]
    ).astype(prob.lm_pos.dtype)                                        # (C, W*N)
    sel_row = (
        prob.obs_lm[:, None, :] == jnp.arange(C, dtype=jnp.int32)[None, :, None]
    ).astype(prob.lm_pos.dtype)                                        # (W, C, N)
    _pex = jax.lax.Precision.HIGHEST  # exact 0/1 selection

    def lm_iter(carry):
        it, cam_T, lm_pos, inlier, lam, done = carry
        px_hat, J_c, J_p = _project_all(cam_T, lm_pos, prob.obs_lm, intr)
        r = prob.obs_px - px_hat                  # (W, N, 2)
        chi2 = jnp.sum(r * r, axis=-1)
        wgt = _huber_w(chi2, huber_delta)
        wgt = jnp.where(base_valid & inlier, wgt, 0.0)
        # Fixed cameras get no pose update but still constrain landmarks.
        J_c = jnp.where(prob.cam_fixed[:, None, None, None], 0.0, J_c)

        # Per-camera block B (W,6,6) and rhs b_c (W,6).
        B = jnp.einsum("wnki,wn,wnkj->wij", J_c, wgt, J_c)
        b_c = jnp.einsum("wnki,wn,wnk->wi", J_c, wgt, r)

        # Landmark blocks via one-hot matmul over slots (MXU, not scatter).
        JtJ_p = jnp.einsum("wnki,wn,wnkj->wnij", J_p, wgt, J_p).reshape(-1, 9)
        Jtr_p = jnp.einsum("wnki,wn,wnk->wni", J_p, wgt, r).reshape(-1, 3)
        C_blk = jnp.einsum("cm,mf->cf", sel_flat, JtJ_p, precision=_pex).reshape(C, 3, 3)
        b_p = jnp.einsum("cm,mf->cf", sel_flat, Jtr_p, precision=_pex)

        # Camera-landmark strip E (W, C, 6, 3): per window row, reduce over N.
        JcJp = jnp.einsum("wnki,wn,wnkj->wnij", J_c, wgt, J_p)  # (W, N, 6, 3)
        E = jnp.einsum(
            "wcn,wnf->wcf", sel_row, JcJp.reshape(W, N, 18), precision=_pex
        ).reshape(W, C, 6, 3)

        # Damp; fixed/invalid landmarks contribute as constants: C^-1 = 0.
        C_damped = C_blk + lam * jnp.eye(3, dtype=C_blk.dtype)
        C_inv = _inv3x3(C_damped)
        C_inv = jnp.where(lm_free[:, None, None], C_inv, 0.0)

        # Reduced camera system S dx = rhs.
        ECi = jnp.einsum("wcij,cjk->wcik", E, C_inv)            # (W, C, 6, 3)
        S = -jnp.einsum("wcik,vclk->wivl", ECi, E)              # (W,6,W,6)
        diag = jnp.arange(W)
        S = S.at[diag, :, diag, :].add(B + lam * jnp.eye(6, dtype=B.dtype))
        rhs = b_c - jnp.einsum("wcik,ck->wi", ECi, b_p)         # (W, 6)

        # Mask empty/fixed window slots: identity rows.
        Sm = S.reshape(W * 6, W * 6)
        slot_mask = jnp.repeat(prob.cam_valid & ~prob.cam_fixed, 6)
        Sm = jnp.where(slot_mask[:, None] & slot_mask[None, :], Sm, 0.0)
        Sm = Sm + jnp.diag(jnp.where(slot_mask, 0.0, 1.0))
        rhs_m = jnp.where(slot_mask, rhs.reshape(-1), 0.0)

        dx_cam = jnp.linalg.solve(
            Sm + 1e-8 * jnp.eye(W * 6, dtype=Sm.dtype), rhs_m
        ).reshape(W, 6)

        # Back-substitute landmarks: dx_p = C^-1 (b_p - E^T dx_cam).
        Et_dx = jnp.einsum("wcij,wi->cj", E, dx_cam)
        dx_p = jnp.einsum("cij,cj->ci", C_inv, b_p - Et_dx)

        cam_T_new = se3.exp(dx_cam) @ cam_T
        cam_T_new = jnp.where(
            (prob.cam_valid & ~prob.cam_fixed)[:, None, None], cam_T_new, cam_T
        )
        lm_new = jnp.where(lm_free[:, None], lm_pos + dx_p, lm_pos)

        # LM acceptance on the robust cost.
        mask = jnp.where(base_valid & inlier, 1.0, 0.0)
        cost_old = jnp.sum(_robust_cost(chi2, huber_delta) * mask)
        chi2_new = chi2_of(cam_T_new, lm_new)
        cost_new = jnp.sum(_robust_cost(chi2_new, huber_delta) * mask)
        ok = cost_new < cost_old
        cam_T = jnp.where(ok, cam_T_new, cam_T)
        lm_pos = jnp.where(ok, lm_new, lm_pos)
        # Accepted steps decay damping fast toward Gauss-Newton (quadratic
        # convergence); rejections raise it hard so the very next retry is
        # already conservative — the 0.5/4 schedule measured 2-3 wasted
        # iterations per stall.
        lam = jnp.where(ok, jnp.maximum(lam / 3.0, 1e-8), jnp.minimum(lam * 10.0, 1e3))
        # Early exit ONLY on a numerically-converged ACCEPTED step (same
        # rationale and same caveat as ops/lm.py — the rejected-step exit
        # variant measurably degraded world ATE and was reverted).  The
        # LANDMARK step must be converged too: a near-zero camera step with
        # landmarks still moving is mid-alternation, not convergence —
        # exiting there left the map subtly under-refined on CPU, whose
        # exact f32 arithmetic reaches tiny camera steps far earlier than
        # the TPU's mixed-precision path.
        dxp_masked = jnp.where(lm_free[:, None], dx_p, 0.0)
        done = ok & (jnp.sum(dx_cam * dx_cam) < 1e-10) & (
            jnp.sum(dxp_masked * dxp_masked) < 1e-8
        )
        return it + 1, cam_T, lm_pos, inlier, lam, done

    # The reference's round schedule stops once the inlier ratio clears 0.5
    # (backend.cpp:212-232) — in practice after 1-2 of the 5 allowed rounds.
    # A while_loop keeps that early exit on device (no host sync).
    n_base = jnp.maximum(jnp.sum(base_valid.astype(jnp.int32)), 1)

    def round_cond(carry):
        _, _, _, _, rnd, done = carry
        return jnp.logical_and(rnd < rounds, jnp.logical_not(done))

    def one_round(carry):
        cam_T, lm_pos, inlier, lam, rnd, _ = carry
        _, cam_T, lm_pos, inlier, lam, _ = jax.lax.while_loop(
            lambda c: jnp.logical_and(c[0] < iters, jnp.logical_not(c[5])),
            lm_iter,
            (jnp.int32(0), cam_T, lm_pos, inlier, lam, jnp.bool_(False)),
        )
        chi2 = chi2_of(cam_T, lm_pos)
        inlier = base_valid & (chi2 <= chi2_threshold)
        ratio = jnp.sum(inlier.astype(jnp.float32)) / n_base.astype(jnp.float32)
        return (cam_T, lm_pos, inlier, lam, rnd + 1, ratio > 0.5)

    init = (
        prob.cam_T,
        prob.lm_pos,
        base_valid,
        jnp.asarray(damping0, prob.cam_T.dtype),
        jnp.int32(0),
        jnp.bool_(False),
    )
    cam_T, lm_pos, inlier, _, _, _ = jax.lax.while_loop(round_cond, one_round, init)
    # Remove accumulated rotation drift; untouched slots stay bit-identical.
    moved = prob.cam_valid & ~prob.cam_fixed
    cam_T = jnp.where(moved[:, None, None], se3.orthonormalize(cam_T), cam_T)
    chi2 = chi2_of(cam_T, lm_pos)
    return BAResult(cam_T=cam_T, lm_pos=lm_pos, obs_inlier=inlier, chi2=chi2)
