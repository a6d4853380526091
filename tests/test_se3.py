"""Unit tests for batched SE(3) ops against scipy's reference implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from stereoslam_tpu.ops import se3


def random_twists(rng, n, scale=1.0):
    return (rng.standard_normal((n, 6)) * scale).astype(np.float32)


def test_exp_log_roundtrip(rng):
    xi = random_twists(rng, 64, scale=0.8)
    T = se3.exp(jnp.asarray(xi))
    xi_back = se3.log(T)
    np.testing.assert_allclose(np.asarray(xi_back), xi, atol=2e-4)


def test_exp_matches_scipy_rotation(rng):
    w = rng.standard_normal((32, 3)).astype(np.float32)
    R = np.asarray(se3.so3_exp(jnp.asarray(w)))
    R_ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_log_near_pi(rng):
    axes = rng.standard_normal((16, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    for angle in [np.pi - 1e-4, np.pi - 1e-2, 3.0]:
        w = (axes * angle).astype(np.float32)
        R = Rotation.from_rotvec(w).as_matrix().astype(np.float32)
        w_back = np.asarray(se3.so3_log(jnp.asarray(R)))
        R_back = Rotation.from_rotvec(w_back).as_matrix()
        np.testing.assert_allclose(R_back, R, atol=5e-3)


def test_inverse_and_compose(rng):
    xi = random_twists(rng, 16)
    T = se3.exp(jnp.asarray(xi))
    eye = se3.mul(T, se3.inv(T))
    np.testing.assert_allclose(np.asarray(eye), np.broadcast_to(np.eye(4), (16, 4, 4)), atol=1e-5)


def test_act_matches_matrix(rng):
    xi = random_twists(rng, 8)
    T = se3.exp(jnp.asarray(xi))
    p = jnp.asarray(rng.standard_normal((8, 3)).astype(np.float32))
    q = se3.act(T, p)
    ph = jnp.concatenate([p, jnp.ones((8, 1), jnp.float32)], axis=-1)
    q_ref = jnp.einsum("nij,nj->ni", T, ph)[..., :3]
    np.testing.assert_allclose(np.asarray(q), np.asarray(q_ref), atol=1e-5)


def test_quaternion_roundtrip(rng):
    xi = random_twists(rng, 32)
    T = se3.exp(jnp.asarray(xi))
    q = se3.to_quaternion(T)
    # scipy uses [x, y, z, w] — same order as our TUM export.
    q_ref = Rotation.from_matrix(np.asarray(T[..., :3, :3])).as_quat()
    dot = np.abs(np.sum(np.asarray(q) * q_ref, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)
    T_back = se3.from_quaternion(q, se3.translation(T))
    np.testing.assert_allclose(np.asarray(T_back), np.asarray(T), atol=1e-5)


def test_left_update_matches_manual(rng):
    xi0 = random_twists(rng, 4)
    dx = random_twists(rng, 4, scale=0.01)
    T = se3.exp(jnp.asarray(xi0))
    T2 = se3.left_update(T, jnp.asarray(dx))
    T2_ref = se3.exp(jnp.asarray(dx)) @ T
    np.testing.assert_allclose(np.asarray(T2), np.asarray(T2_ref), atol=1e-6)


def test_jit_and_vmap():
    xi = jnp.ones((6,), jnp.float32) * 0.1
    T1 = jax.jit(se3.exp)(xi)
    T2 = jax.vmap(se3.exp)(jnp.stack([xi, xi]))
    np.testing.assert_allclose(np.asarray(T2[0]), np.asarray(T1), atol=1e-7)


def test_orthonormalize(rng):
    xi = random_twists(rng, 8)
    T = se3.exp(jnp.asarray(xi))
    T_noisy = T.at[..., :3, :3].add(jnp.asarray(rng.standard_normal((8, 3, 3)).astype(np.float32)) * 1e-3)
    T_fixed = se3.orthonormalize(T_noisy)
    R = np.asarray(T_fixed[..., :3, :3])
    np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
