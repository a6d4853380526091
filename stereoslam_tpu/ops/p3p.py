"""Batched P3P minimal solver (Grunert) with a closed-form quartic.

The reference delegates loop-verification pose estimation to
``cv::solvePnPRansac`` (reference src/loopclosing.cpp:264), whose default
minimal solvers handle planar landmark sets.  The 6-point DLT in
:mod:`stereoslam_tpu.ops.pnp` degenerates exactly there (coplanar points
make the 12x12 DLT system rank-deficient), so this module provides the
3-point perspective pose problem as a second hypothesis generator:

- Grunert's elimination reduces P3P to a quartic in the depth ratio
  ``v = s3/s1``.  The coefficients below were derived symbolically (sympy
  resultant of the two depth quadrics) — not transcribed from literature —
  and each returned root is re-validated by evaluating the quartic, so any
  numerically-degenerate branch is masked rather than trusted.
- The quartic is solved in closed form (factorization into two quadratics
  via the resolvent cubic, Cardano/trigonometric), pure real arithmetic:
  no ``eigvals`` (unsupported on TPU), no iteration, fixed shapes — it
  vmaps over thousands of RANSAC hypotheses.  The solve runs in f32 (the
  framework keeps x64 off, ops/se3.py:15); the world triangle is
  rescaled to unit RMS side length first so every quartic coefficient is
  O(1), which keeps f32 fully adequate — and bad roots are masked by the
  residual check, never silently used.
- Depths -> camera-frame points -> 3-point orthogonal-Procrustes alignment
  gives up to 4 pose candidates per sample; RANSAC scoring picks among
  them like any other hypothesis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stereoslam_tpu.ops import se3

_EPS = 1e-12


# ---------------------------------------------------------------------------
# Closed-form real-root solvers (f64, fixed shape, no linalg)
# ---------------------------------------------------------------------------


def _cbrt(x):
    return jnp.sign(x) * jnp.abs(x) ** (1.0 / 3.0)


def _cubic_max_real_root(c2, c1, c0):
    """Largest real root of z^3 + c2 z^2 + c1 z + c0 (scalars, f64)."""
    p = c1 - c2 * c2 / 3.0
    q = 2.0 * c2**3 / 27.0 - c2 * c1 / 3.0 + c0
    shift = -c2 / 3.0
    disc = (q / 2.0) ** 2 + (p / 3.0) ** 3

    # One-real-root branch (disc > 0): Cardano.
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_one = _cbrt(-q / 2.0 + sq) + _cbrt(-q / 2.0 - sq)

    # Three-real-root branch (disc <= 0): trigonometric; max root is k=0.
    m = jnp.sqrt(jnp.maximum(-p / 3.0, _EPS))
    cosarg = jnp.clip(3.0 * q / (2.0 * p * m + jnp.where(p == 0, _EPS, 0.0)), -1.0, 1.0)
    t_three = 2.0 * m * jnp.cos(jnp.arccos(cosarg) / 3.0)

    return jnp.where(disc > 0, t_one, t_three) + shift


def quartic_real_roots(c4, c3, c2, c1, c0):
    """Real roots of c4 x^4 + c3 x^3 + c2 x^2 + c1 x + c0.

    Returns (roots (4,), valid (4,) bool).  Roots whose quadratic
    discriminant is negative are masked.  Callers should additionally
    residual-check (cheap) because extreme coefficient ratios can degrade
    the factorization.
    """
    c4s = jnp.where(jnp.abs(c4) < _EPS, jnp.sign(c4) * _EPS + _EPS, c4)
    a = c3 / c4s
    b = c2 / c4s
    c = c1 / c4s
    d = c0 / c4s

    # Depress: x = y - a/4 -> y^4 + p y^2 + q y + r.
    p = b - 3.0 * a * a / 8.0
    q = c - a * b / 2.0 + a**3 / 8.0
    r = d - a * c / 4.0 + a * a * b / 16.0 - 3.0 * a**4 / 256.0

    # Factor y^4+py^2+qy+r = (y^2 + al y + be)(y^2 - al y + ga):
    # z = al^2 solves z^3 + 2p z^2 + (p^2 - 4r) z - q^2 = 0 (max root >= 0).
    z0 = _cubic_max_real_root(2.0 * p, p * p - 4.0 * r, -q * q)
    z0 = jnp.maximum(z0, 0.0)
    al = jnp.sqrt(z0)

    small = al < 1e-10
    al_s = jnp.where(small, 1.0, al)
    be = jnp.where(small, 0.0, (p + z0 - q / al_s) / 2.0)
    ga = jnp.where(small, 0.0, (p + z0 + q / al_s) / 2.0)
    # al ~ 0: biquadratic y^4 + p y^2 + r -> y^2 = roots of w^2 + p w + r.
    dq = jnp.maximum(p * p / 4.0 - r, 0.0)
    w1 = -p / 2.0 + jnp.sqrt(dq)
    w2 = -p / 2.0 - jnp.sqrt(dq)
    be = jnp.where(small, -w1, be)
    ga = jnp.where(small, -w2, ga)

    def quad_roots(B_, C_):
        disc = B_ * B_ / 4.0 - C_
        ok = disc >= 0.0
        s = jnp.sqrt(jnp.maximum(disc, 0.0))
        return (-B_ / 2.0 + s, -B_ / 2.0 - s, ok)

    r1, r2, ok12 = quad_roots(al, be)
    r3, r4, ok34 = quad_roots(-al, ga)

    roots = jnp.stack([r1, r2, r3, r4]) - a / 4.0
    valid = jnp.stack([ok12, ok12, ok34, ok34])
    # Residual re-validation against the original quartic, scale-normalized.
    res = ((roots * c4 * roots + c3 * roots + c2) * roots + c1) * roots + c0
    scale = jnp.maximum(
        jnp.abs(c4) * jnp.abs(roots) ** 4 + jnp.abs(c3) * jnp.abs(roots) ** 3
        + jnp.abs(c2) * roots * roots + jnp.abs(c1) * jnp.abs(roots) + jnp.abs(c0),
        _EPS,
    )
    valid = valid & (jnp.abs(res) / scale < 1e-4)
    return roots, valid


# ---------------------------------------------------------------------------
# P3P (Grunert): 3 world points + 3 bearings -> up to 4 poses
# ---------------------------------------------------------------------------


def _procrustes_3pt(Pw, Pc):
    """Rigid T_cw with Pc ~= R @ Pw + t from 3 correspondences."""
    cw = Pw.mean(axis=0)
    cc = Pc.mean(axis=0)
    H = (Pw - cw).T @ (Pc - cc)
    u, _, vt = jnp.linalg.svd(H)
    d = jnp.linalg.det(vt.T @ u.T)
    D = jnp.diag(jnp.asarray([1.0, 1.0, 1.0], H.dtype)).at[2, 2].set(d)
    R = vt.T @ D @ u.T
    t = cc - R @ cw
    return se3.from_Rt(R, t)


def p3p_poses(X_w: jnp.ndarray, pn: jnp.ndarray):
    """Solve P3P for one 3-point sample.

    Args:
      X_w: (3, 3) world points.
      pn: (3, 2) normalized image coordinates (x/z, y/z).

    Returns (T (4, 4, 4) candidate poses T_cw, valid (4,) bool).
    """
    f = jnp.concatenate([pn, jnp.ones((3, 1), pn.dtype)], axis=1)
    f = f / jnp.linalg.norm(f, axis=1, keepdims=True)  # bearing vectors

    # Rescale the world triangle to unit RMS side: keeps the quartic
    # coefficients O(1) in f32.  Depths (and thus t) scale linearly.
    A0_ = jnp.sum((X_w[1] - X_w[2]) ** 2)
    B0_ = jnp.sum((X_w[0] - X_w[2]) ** 2)
    C0_ = jnp.sum((X_w[0] - X_w[1]) ** 2)
    world_scale = jnp.sqrt(jnp.maximum((A0_ + B0_ + C0_) / 3.0, _EPS))
    X = X_w / world_scale

    # Side lengths squared: a = |P2-P3|, b = |P1-P3|, c = |P1-P2|.
    A = A0_ / world_scale**2
    B = B0_ / world_scale**2
    C = C0_ / world_scale**2
    ca = jnp.dot(f[1], f[2])
    cb = jnp.dot(f[0], f[2])
    cg = jnp.dot(f[0], f[1])

    # Quartic in v = s3/s1 (sympy resultant; see module docstring).
    A4 = A**2 - 2*A*B - 2*A*C + B**2 - 4*B*C*ca**2 + 2*B*C + C**2
    A3 = 4.0 * (-A**2*cb + A*B*ca*cg + A*B*cb + 2*A*C*cb - B**2*ca*cg
                + 2*B*C*ca**2*cb + B*C*ca*cg - B*C*cb - C**2*cb)
    A2 = 2.0 * (2*A**2*cb**2 + A**2 - 4*A*B*ca*cb*cg - 2*A*B*cg**2
                - 4*A*C*cb**2 - 2*A*C + 2*B**2*ca**2 + 2*B**2*cg**2 - B**2
                - 2*B*C*ca**2 - 4*B*C*ca*cb*cg + 2*C**2*cb**2 + C**2)
    A1 = 4.0 * (-A**2*cb + A*B*ca*cg + 2*A*B*cb*cg**2 - A*B*cb + 2*A*C*cb
                - B**2*ca*cg + B*C*ca*cg + B*C*cb - C**2*cb)
    A0 = A**2 - 4*A*B*cg**2 + 2*A*B - 2*A*C + B**2 - 2*B*C + C**2

    v, v_ok = quartic_real_roots(A4, A3, A2, A1, A0)  # (4,)

    Q2 = 1.0 + v * v - 2.0 * v * cb          # = B / s1^2
    s1 = jnp.sqrt(B / jnp.maximum(Q2, _EPS))
    # u from the linear combination of the two depth quadrics
    # (e1 - e2 = 0, linear in u): 2B(cg - v ca) u = (A - C) Q2 + B (1 - v^2).
    den = 2.0 * B * (cg - v * ca)
    u = ((A - C) * Q2 + B * (1.0 - v * v)) / jnp.where(jnp.abs(den) < _EPS, _EPS, den)
    s2 = u * s1
    s3 = v * s1
    ok = v_ok & (Q2 > _EPS) & (s1 > 0) & (s2 > 0) & (s3 > 0) & (jnp.abs(den) > 1e-9)

    depths = jnp.stack([s1, s2, s3], axis=1)  # (4, 3)
    Pc = depths[:, :, None] * f[None, :, :]   # (4, 3, 3) camera-frame points

    T = jax.vmap(lambda pc: _procrustes_3pt(X, pc))(Pc)  # (4, 4, 4), unit scale
    # Validate: the recovered pose must actually reproduce the depths
    # (Procrustes of an inconsistent depth triple gives garbage silently).
    Pc_hat = jnp.einsum("kij,nj->kni", T[:, :3, :3], X) + T[:, None, :3, 3]
    fit = jnp.max(jnp.linalg.norm(Pc_hat - Pc, axis=-1), axis=-1)
    ok = ok & (fit < 1e-3)
    # Undo the world rescale: R is scale-free, t scales with the world.
    T = T.at[:, :3, 3].multiply(world_scale)
    return T.astype(jnp.float32), ok
