"""Masked batched Levenberg–Marquardt for pose-only reprojection optimization.

Replaces the reference's per-frame g2o graph build + solve
(reference src/frontend.cpp:176-276 and the loop-closure refinement at
src/loopclosing.cpp:339-433, with the analytic Jacobians of
include/myslam/g2o_types.h:63-102): a single SE(3) vertex, N unary
reprojection edges with Huber robust kernels, and the reference's
4-rounds-of-10-iterations chi^2 outlier schedule (chi2 = 5.991,
frontend.cpp:218-247) — all reproduced with masking instead of edge
removal, so the whole solve is one fixed-shape jitted program.

Convention: ``T_cw`` maps world -> camera; residual = observed_px -
project(T_cw * X_w), and the Jacobian w.r.t. a *left*-multiplicative update
``exp(dx) * T_cw`` matches the reference's vertex parameterization
(g2o_types.h:36-41).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from stereoslam_tpu.ops import se3
from stereoslam_tpu.ops.camera import Intrinsics


class PoseOptResult(NamedTuple):
    T_cw: jnp.ndarray        # (4, 4) optimized pose
    inlier: jnp.ndarray      # (N,) bool — final inlier classification
    num_inliers: jnp.ndarray  # () int32
    chi2: jnp.ndarray        # (N,) final squared reprojection error (pixels^2)


def project_only(T_cw: jnp.ndarray, X_w: jnp.ndarray, intr: Intrinsics) -> jnp.ndarray:
    """Projection without Jacobians (for cost evaluation)."""
    P = se3.act(T_cw, X_w)
    Z = jnp.where(jnp.abs(P[..., 2]) < 1e-6, 1e-6, P[..., 2])
    u = intr.fx * P[..., 0] / Z + intr.cx
    v = intr.fy * P[..., 1] / Z + intr.cy
    return jnp.stack([u, v], axis=-1)


def project_jacobian(
    T_cw: jnp.ndarray, X_w: jnp.ndarray, intr: Intrinsics
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Projection + analytic 2x6 Jacobian w.r.t. left-mul twist [v, w].

    Mirrors EdgeProjectionPoseOnly::linearizeOplus (g2o_types.h:80-99) —
    d(px)/d(xi) for xi ordered [translation, rotation].

    Returns: (px (..., 2), J (..., 2, 6)).
    """
    P = se3.act(T_cw, X_w)
    X, Y, Z = P[..., 0], P[..., 1], P[..., 2]
    Z = jnp.where(jnp.abs(Z) < 1e-6, 1e-6, Z)
    Zinv = 1.0 / Z
    Zinv2 = Zinv * Zinv
    u = intr.fx * X * Zinv + intr.cx
    v = intr.fy * Y * Zinv + intr.cy
    px = jnp.stack([u, v], axis=-1)

    fx, fy = intr.fx, intr.fy
    # d(px)/d(P_cam):
    du = jnp.stack([fx * Zinv, jnp.zeros_like(Z), -fx * X * Zinv2], axis=-1)
    dv = jnp.stack([jnp.zeros_like(Z), fy * Zinv, -fy * Y * Zinv2], axis=-1)
    dpx_dP = jnp.stack([du, dv], axis=-2)  # (..., 2, 3)
    # d(P_cam)/d(xi) for left-mul update: [I | -hat(P_cam)].
    dP_dxi = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.eye(3, dtype=P.dtype), P.shape[:-1] + (3, 3)),
            -se3.hat(P),
        ],
        axis=-1,
    )  # (..., 3, 6)
    J = dpx_dP @ dP_dxi  # (..., 2, 6)
    return px, J


def _huber_weight(chi2: jnp.ndarray, delta2: float) -> jnp.ndarray:
    """IRLS weight of the Huber kernel with threshold delta (g2o's
    RobustKernelHuber(sqrt(chi2_th)) used at frontend.cpp:207)."""
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))


def solve6(H: jnp.ndarray, b: jnp.ndarray, damping: jnp.ndarray) -> jnp.ndarray:
    """Solve the damped 6x6 normal equations via Cholesky."""
    A = H + damping * jnp.eye(6, dtype=H.dtype)
    L = jnp.linalg.cholesky(A)
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)


def optimize_pose(
    T_cw0: jnp.ndarray,
    X_w: jnp.ndarray,
    obs_px: jnp.ndarray,
    valid: jnp.ndarray,
    intr: Intrinsics,
    rounds: int = 4,
    iters: int = 10,
    chi2_threshold: float = 5.991,
    damping0: float = 1e-3,
) -> PoseOptResult:
    """Pose-only robust LM with the reference's outlier schedule.

    Args:
      T_cw0: (4, 4) initial pose (constant-velocity prior upstream).
      X_w: (N, 3) landmark positions (fixed).
      obs_px: (N, 2) observed pixel positions.
      valid: (N,) bool — slots that correspond to real observations.

    Schedule parity with frontend.cpp:213-247: ``rounds`` outer rounds; after
    each, observations with chi2 > threshold are flagged outliers (excluded
    from the next round's normal equations); flagged observations may return
    (ref: feature->mbIsOutlier reset when chi2 drops); the robust kernel is
    dropped for observations that stayed inliers past round 2 (ref sets
    edge->setRobustKernel(nullptr) after round 1, 0-indexed round 2 there).
    """
    delta2 = chi2_threshold

    def li_iter(carry):
        it, T, inlier, lam, use_huber, done = carry
        px, J = project_jacobian(T, X_w, intr)
        r = obs_px - px                        # (N, 2)
        chi2 = jnp.sum(r * r, axis=-1)
        w = jnp.where(use_huber, _huber_weight(chi2, delta2), 1.0)
        w = jnp.where(valid & inlier, w, 0.0)
        # Normal equations: H = sum w J^T J, b = sum w J^T r.
        Hn = jnp.einsum("nki,n,nkj->ij", J, w, J)
        bn = jnp.einsum("nki,n,nk->i", J, w, r)
        dx = solve6(Hn, bn, lam)
        T_new = se3.left_update(T, dx)
        # Accept if total robust error decreased (simple LM gate).
        px2 = project_only(T_new, X_w, intr)
        r2 = obs_px - px2
        chi2_new = jnp.sum(r2 * r2, axis=-1)
        mask = jnp.where(valid & inlier, 1.0, 0.0)
        cost_old = jnp.sum(jnp.minimum(chi2, delta2 + jnp.sqrt(delta2 * chi2)) * mask)
        cost_new = jnp.sum(jnp.minimum(chi2_new, delta2 + jnp.sqrt(delta2 * chi2_new)) * mask)
        improved = cost_new < cost_old
        T = jnp.where(improved, T_new, T)
        lam = jnp.where(improved, jnp.maximum(lam * 0.5, 1e-6), jnp.minimum(lam * 4.0, 1e2))
        # Early exit ONLY on a numerically-converged ACCEPTED step: each LM
        # iteration is a sequential device step and the solve typically
        # converges well inside the 10-iteration budget.  (A rejected-step/
        # saturated-damping exit was tried and REVERTED: high-damping
        # iterations still make slow progress and refine the inlier set —
        # cutting them moved the canonical world ATE 0.86 -> 2.2 m.)
        done = improved & (jnp.sum(dx * dx) < 1e-12)
        return it + 1, T, inlier, lam, use_huber, done

    def one_round(carry, round_idx):
        T, inlier, lam = carry
        # Reference drops the Huber kernel after two rounds (frontend.cpp:251).
        use_huber = round_idx < 2
        _, T, _, lam, _, _ = jax.lax.while_loop(
            lambda c: jnp.logical_and(c[0] < iters, jnp.logical_not(c[5])),
            li_iter,
            (jnp.int32(0), T, inlier, lam, use_huber, jnp.bool_(False)),
        )
        # Re-classify: chi2 against threshold (frontend.cpp:232-246) — flagged
        # points may be reinstated if their error dropped.
        px = project_only(T, X_w, intr)
        r = obs_px - px
        chi2 = jnp.sum(r * r, axis=-1)
        inlier = valid & (chi2 <= delta2)
        return (T, inlier, lam), None

    inlier0 = valid
    (T, inlier, _), _ = jax.lax.scan(
        one_round,
        (T_cw0, inlier0, jnp.asarray(damping0, T_cw0.dtype)),
        jnp.arange(rounds),
    )
    # Project the rotation back onto SO(3): ~50 left-multiplicative updates
    # accumulate orthogonality drift that would bias later reprojections.
    T = se3.orthonormalize(T)
    px = project_only(T, X_w, intr)
    r = obs_px - px
    chi2 = jnp.sum(r * r, axis=-1)
    return PoseOptResult(
        T_cw=T,
        inlier=inlier,
        num_inliers=jnp.sum(inlier.astype(jnp.int32)),
        chi2=chi2,
    )
