"""Batched SE(3) Lie-group operations.

TPU-native replacement for the reference's per-object ``Sophus::SE3d`` math
(reference include/myslam/common_include.h:95-99 and the left-multiplicative
pose updates in include/myslam/g2o_types.h:32-41).  Every function here is
pure, broadcasts over arbitrary leading batch dimensions, and is jit/vmap/
grad-compatible, so pose updates for a whole keyframe window or an entire
pose graph happen as one vectorized call instead of per-vertex virtual
dispatch.

Representation: homogeneous ``(..., 4, 4)`` float32 matrices.  Tangent
vectors are ``(..., 6)`` with translation first: ``xi = [v, w]`` (the same
convention Sophus uses, so reference update semantics carry over).

float64 is intentionally avoided: TPUs have no native f64.  The numerically
delicate paths (exp/log near the identity, rotation log near pi) use Taylor
guards so f32 stays accurate enough for trajectory-level parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`hat`: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues' formula, (..., 3) -> (..., 3, 3) rotation matrices."""
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < _EPS
    # Double-where trick: evaluate the generic branch at a safe theta so its
    # *gradient* stays finite where the Taylor branch is selected (otherwise
    # autodiff propagates 0 * nan through the untaken branch).
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    # sin(t)/t and (1-cos t)/t^2 with Taylor fallbacks near 0.
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    W = hat(w)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * WW


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation-matrix logarithm, (..., 3, 3) -> (..., 3).

    Handles the three regimes — near identity (Taylor), generic, near pi
    (axis from R + I) — branch-free AND autodiff-safe: theta comes from
    atan2 (arccos has an infinite gradient at the identity), and every
    untaken branch is evaluated at guarded inputs so reverse/forward-mode
    never sees 0 * nan.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    antisym = vee(R - jnp.swapaxes(R, -1, -2))
    sin_theta = 0.5 * jnp.sqrt(
        jnp.maximum(jnp.sum(antisym * antisym, axis=-1), 1e-24)
    )
    theta = jnp.arctan2(sin_theta, cos_theta)

    # Generic: w = theta / (2 sin theta) * vee(R - R^T); Taylor near 0.
    small = sin_theta < 1e-5
    sin_safe = jnp.where(small, 1.0, sin_theta)
    scale_generic = jnp.where(
        small,
        0.5 + theta * theta / 12.0,
        theta / (2.0 * sin_safe),
    )
    w_generic = scale_generic[..., None] * antisym

    # Near pi: |w_i| from diagonal; sign fixed from the antisymmetric part
    # (which vanishes at exactly pi — use the largest row of R + I instead).
    B = R + jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)  # = 2(ww^T/theta^2-ish)
    diag = jnp.stack([B[..., 0, 0], B[..., 1, 1], B[..., 2, 2]], axis=-1)
    axis_sq = jnp.maximum(diag, 0.0)
    k = jnp.argmax(axis_sq, axis=-1)
    col = jnp.take_along_axis(B, k[..., None, None].repeat(3, axis=-2), axis=-1)[..., 0]
    norm = jnp.linalg.norm(col, axis=-1, keepdims=True)
    axis = col / jnp.maximum(norm, _EPS)
    w_pi = axis * theta[..., None]

    near_pi = theta > (jnp.pi - 1e-3)
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def _so3_left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """SO(3) left Jacobian J_l(w): integrates translation through rotation."""
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < _EPS
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2_safe * theta))
    W = hat(w)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * WW


def _so3_left_jacobian_inv(w: jnp.ndarray) -> jnp.ndarray:
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < _EPS
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    half = theta * 0.5
    cot = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.maximum(jnp.sin(half), _EPS)) / theta2_safe,
    )
    W = hat(w)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + cot[..., None, None] * WW


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    """SE(3) exponential: (..., 6) twist [v, w] -> (..., 4, 4)."""
    v, w = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    t = jnp.einsum("...ij,...j->...i", _so3_left_jacobian(w), v)
    return from_Rt(R, t)


def log(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) logarithm: (..., 4, 4) -> (..., 6) twist [v, w]."""
    R, t = T[..., :3, :3], T[..., :3, 3]
    w = so3_log(R)
    v = jnp.einsum("...ij,...j->...i", _so3_left_jacobian_inv(w), t)
    return jnp.concatenate([v, w], axis=-1)


def from_Rt(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble (..., 4, 4) from rotation (..., 3, 3) and translation (..., 3)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), dtype=R.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def identity(batch_shape=(), dtype=jnp.float32) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.eye(4, dtype=dtype), tuple(batch_shape) + (4, 4))


def inv(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form SE(3) inverse (no general 4x4 solve)."""
    R, t = T[..., :3, :3], T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return from_Rt(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def mul(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    return A @ B


def act(T: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply transform(s) to point(s): (..., 4, 4) x (..., 3) -> (..., 3)."""
    return jnp.einsum("...ij,...j->...i", T[..., :3, :3], p) + T[..., :3, 3]


def rotation(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, :3]


def translation(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, 3]


def left_update(T: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """``exp(xi) * T`` — the left-multiplicative update used by the reference's
    pose vertex (g2o_types.h:36-41)."""
    return exp(xi) @ T


def orthonormalize(T: jnp.ndarray) -> jnp.ndarray:
    """Project the rotation block back onto SO(3) via SVD (drift control after
    long chains of f32 composes)."""
    R, t = T[..., :3, :3], T[..., :3, 3]
    u, _, vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(u @ vt)
    u = u.at[..., :, -1].multiply(jnp.sign(det)[..., None])
    return from_Rt(u @ vt, t)


def to_quaternion(T: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) -> quaternion (..., 4) as [qx, qy, qz, qw] (TUM export order,
    reference src/system.cpp:174-175)."""
    R = T[..., :3, :3]
    m00, m11, m22 = R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]
    trace = m00 + m11 + m22

    def _s(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # Four candidate extractions; pick the numerically largest pivot.
    qw0 = 0.5 * _s(1.0 + trace)
    q0 = jnp.stack(
        [
            (R[..., 2, 1] - R[..., 1, 2]) / (4.0 * qw0),
            (R[..., 0, 2] - R[..., 2, 0]) / (4.0 * qw0),
            (R[..., 1, 0] - R[..., 0, 1]) / (4.0 * qw0),
            qw0,
        ],
        axis=-1,
    )
    qx1 = 0.5 * _s(1.0 + m00 - m11 - m22)
    q1 = jnp.stack(
        [
            qx1,
            (R[..., 0, 1] + R[..., 1, 0]) / (4.0 * qx1),
            (R[..., 0, 2] + R[..., 2, 0]) / (4.0 * qx1),
            (R[..., 2, 1] - R[..., 1, 2]) / (4.0 * qx1),
        ],
        axis=-1,
    )
    qy2 = 0.5 * _s(1.0 - m00 + m11 - m22)
    q2 = jnp.stack(
        [
            (R[..., 0, 1] + R[..., 1, 0]) / (4.0 * qy2),
            qy2,
            (R[..., 1, 2] + R[..., 2, 1]) / (4.0 * qy2),
            (R[..., 0, 2] - R[..., 2, 0]) / (4.0 * qy2),
        ],
        axis=-1,
    )
    qz3 = 0.5 * _s(1.0 - m00 - m11 + m22)
    q3 = jnp.stack(
        [
            (R[..., 0, 2] + R[..., 2, 0]) / (4.0 * qz3),
            (R[..., 1, 2] + R[..., 2, 1]) / (4.0 * qz3),
            qz3,
            (R[..., 1, 0] - R[..., 0, 1]) / (4.0 * qz3),
        ],
        axis=-1,
    )
    pivots = jnp.stack([trace, m00, m11, m22], axis=-1)
    choice = jnp.argmax(pivots, axis=-1)[..., None]
    q = jnp.select(
        [choice == 0, choice == 1, choice == 2],
        [q0, q1, q2],
        q3,
    )
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def from_quaternion(q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Quaternion [qx, qy, qz, qw] + translation -> (..., 4, 4)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], axis=-1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], axis=-1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )
    return from_Rt(R, t)
