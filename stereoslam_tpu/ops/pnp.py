"""Batched RANSAC PnP (DLT + orthogonal Procrustes).

Replaces ``cv::solvePnPRansac`` in the reference's loop verification
(reference src/loopclosing.cpp:264: 100 iterations, reprojection threshold
5.991, confidence 0.99).  RANSAC maps beautifully to the TPU: all K
hypotheses are solved simultaneously — each a 6-point DLT (12-dim nullspace
via batched SVD of the 12x12 normal matrix) projected onto SE(3) — and
scored against all points in one einsum.  The best hypothesis's inliers then
feed the pose-only LM refinement (ops/lm.py), mirroring the reference's
OptimizeCurrentPose (loopclosing.cpp:339-433).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from stereoslam_tpu.ops import se3
from stereoslam_tpu.ops.camera import Intrinsics


class PnPResult(NamedTuple):
    T_cw: jnp.ndarray       # (4, 4) best pose hypothesis
    inliers: jnp.ndarray    # (N,) bool
    num_inliers: jnp.ndarray  # () int32
    ok: jnp.ndarray         # () bool — a usable hypothesis was found


MIN_SET = 6  # DLT needs >= 6 points


def _dlt_pose(X: jnp.ndarray, pn: jnp.ndarray) -> jnp.ndarray:
    """Direct linear transform for one minimal set.

    Args:
      X: (S, 3) world points; pn: (S, 2) normalized image coords (x/z, y/z).

    Returns (4, 4) T_cw with the rotation projected onto SO(3).
    """
    S = X.shape[0]
    ones = jnp.ones((S, 1), X.dtype)
    Xh = jnp.concatenate([X, ones], axis=1)  # (S, 4)
    zeros = jnp.zeros((S, 4), X.dtype)
    # Rows: [X 0 -x*X ; 0 X -y*X] for P = [R|t] (3x4), p = P @ Xh.
    r1 = jnp.concatenate([Xh, zeros, -pn[:, 0:1] * Xh], axis=1)  # (S, 12)
    r2 = jnp.concatenate([zeros, Xh, -pn[:, 1:2] * Xh], axis=1)
    A = jnp.concatenate([r1, r2], axis=0)  # (2S, 12)
    AtA = A.T @ A
    _, vecs = jnp.linalg.eigh(AtA)
    p = vecs[:, 0]  # null direction
    P = p.reshape(3, 4)
    R_raw = P[:, :3]
    # Scale + orthogonalize: SVD-project onto SO(3); recover sign via depth.
    u, s, vt = jnp.linalg.svd(R_raw)
    scale = jnp.mean(s)
    det = jnp.linalg.det(u @ vt)
    R = u @ jnp.diag(jnp.array([1.0, 1.0, 1.0], R_raw.dtype)) @ vt
    R = jnp.where(det < 0, -R, R)
    t = P[:, 3] / jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)
    t = jnp.where(det < 0, -t, t)
    # Cheirality: majority of the minimal set must be in front.
    z = (R @ X.T).T[:, 2] + t[2]
    flip = jnp.sum((z < 0).astype(jnp.int32)) > S // 2
    # A sign flip of p negates both R-det handling above handles t; this extra
    # check guards the residual ambiguity.
    R = jnp.where(flip, -R, R)
    t = jnp.where(flip, -t, t)
    # Re-project onto SO(3) after any flip (det may have flipped too).
    u2, _, vt2 = jnp.linalg.svd(R)
    det2 = jnp.linalg.det(u2 @ vt2)
    u2 = u2.at[:, -1].multiply(jnp.sign(det2))
    R = u2 @ vt2
    return se3.from_Rt(R, t)


def pnp_ransac(
    X_w: jnp.ndarray,
    obs_px: jnp.ndarray,
    valid: jnp.ndarray,
    intr: Intrinsics,
    key: jnp.ndarray,
    iterations: int = 128,
    chi2_threshold: float = 5.991,
    min_inliers: int = 6,
) -> PnPResult:
    """RANSAC over a mixed hypothesis pool, all solved in parallel:

    - ``iterations`` 3-point Grunert P3P samples (up to 4 poses each) —
      the minimal solver, robust to planar landmark sets exactly where
      DLT degenerates (cv::solvePnPRansac parity, loopclosing.cpp:264);
    - ``iterations // 2`` 6-point DLT samples — an over-determined
      generator that wins on noisy non-planar sets.

    Scoring is one shared einsum over every candidate; invalid slots never
    enter minimal sets (weighted categorical sampling) and never count as
    inliers.
    """
    from stereoslam_tpu.ops.p3p import p3p_poses

    N = X_w.shape[0]
    nvalid = jnp.sum(valid.astype(jnp.int32))

    # Sample minimal sets from valid entries: weighted categorical draws.
    k3, k6 = jax.random.split(key)
    logits = jnp.where(valid, 0.0, -1e9)
    n_dlt = max(iterations // 2, 1)
    sets = jax.random.categorical(
        k6, logits[None, :], shape=(n_dlt, MIN_SET)
    )  # (K, S) — may repeat within a set; degenerate sets score poorly and lose.

    T_dlt = jax.vmap(lambda s: _dlt_pose(X_w[s], _normalize(obs_px[s], intr)))(sets)

    sets3 = jax.random.categorical(k3, logits[None, :], shape=(iterations, 3))
    T_p3p, ok3 = jax.vmap(
        lambda s: p3p_poses(X_w[s], _normalize(obs_px[s], intr))
    )(sets3)  # (K, 4, 4, 4), (K, 4)
    T_p3p = T_p3p.reshape(-1, 4, 4)
    ok3 = ok3.reshape(-1)
    # Invalid P3P branches become a pose that puts every point far behind
    # the camera (z = -1e9), guaranteeing zero inliers — an identity
    # placeholder could accidentally score when the true pose is near it.
    far = jnp.eye(4, dtype=T_p3p.dtype).at[2, 3].set(-1e9)
    T_p3p = jnp.where(ok3[:, None, None], T_p3p, far)

    T_hyps = jnp.concatenate([T_p3p, T_dlt], axis=0)

    # Score all hypotheses against all points.
    P_c = jnp.einsum("kij,nj->kni", T_hyps[:, :3, :3], X_w) + T_hyps[:, None, :3, 3]
    z = P_c[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = intr.fx * P_c[..., 0] / z_safe + intr.cx
    v = intr.fy * P_c[..., 1] / z_safe + intr.cy
    r = jnp.stack([u, v], axis=-1) - obs_px[None]
    chi2 = jnp.sum(r * r, axis=-1)
    inl = (chi2 <= chi2_threshold) & (z > 0) & valid[None]
    scores = jnp.sum(inl.astype(jnp.int32), axis=1)

    best = jnp.argmax(scores)
    ok = (scores[best] >= min_inliers) & (nvalid >= MIN_SET)
    return PnPResult(
        T_cw=T_hyps[best],
        inliers=inl[best],
        num_inliers=scores[best],
        ok=ok,
    )


def _normalize(px: jnp.ndarray, intr: Intrinsics) -> jnp.ndarray:
    return jnp.stack(
        [(px[..., 0] - intr.cx) / intr.fx, (px[..., 1] - intr.cy) / intr.fy], axis=-1
    )
