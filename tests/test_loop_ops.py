"""Unit tests for loop-closure kernels: Hamming matching, PnP-RANSAC, PGO."""

import jax
import jax.numpy as jnp
import numpy as np

from stereoslam_tpu.ops import se3
from stereoslam_tpu.ops.camera import Intrinsics, world2pixel
from stereoslam_tpu.ops.hamming import hamming_matrix, match_descriptors
from stereoslam_tpu.ops.pgo import PoseGraph, optimize_pose_graph
from stereoslam_tpu.ops.pnp import pnp_ransac

INTR = Intrinsics.create(400.0, 400.0, 320.0, 160.0)


# ---------------------------------------------------------------- hamming
def rand_desc(rng, n):
    return rng.integers(0, 2**32, (n, 8), dtype=np.uint32)


def flip_bits(rng, d, nbits):
    d = d.copy()
    for i in range(len(d)):
        for _ in range(nbits):
            w = rng.integers(0, 8)
            b = rng.integers(0, 32)
            d[i, w] ^= np.uint32(1 << b)
    return d


def test_hamming_matrix_exact(rng):
    a = rand_desc(rng, 16)
    b = a.copy()
    d = np.asarray(hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
    assert (np.diag(d) == 0).all()
    # off-diagonal ~128 expected for random
    off = d[~np.eye(16, dtype=bool)]
    assert 80 < off.mean() < 176


def test_match_descriptors_finds_pairs(rng):
    n = 64
    base = rand_desc(rng, n)
    noisy = flip_bits(rng, base, 4)  # ~4-bit corruption
    cls = np.arange(n, dtype=np.int32)
    res = match_descriptors(
        jnp.asarray(base), jnp.ones(n, bool),
        jnp.asarray(noisy), jnp.ones(n, bool),
        jnp.asarray(cls), jnp.asarray(cls), max_features=n,
    )
    acc = np.asarray(res.accepted)
    idx = np.asarray(res.best_idx)
    assert acc.sum() > n * 0.9
    assert (idx[acc] == np.arange(n)[acc]).mean() > 0.95


def test_match_dedup_by_class(rng):
    # Two pyramid copies of each feature (same class) — only one match kept.
    n = 32
    base = rand_desc(rng, n)
    a = np.concatenate([base, flip_bits(rng, base, 1)])     # 2 levels
    cls = np.concatenate([np.arange(n), np.arange(n)]).astype(np.int32)
    res = match_descriptors(
        jnp.asarray(a), jnp.ones(2 * n, bool),
        jnp.asarray(a), jnp.ones(2 * n, bool),
        jnp.asarray(cls), jnp.asarray(cls), max_features=n,
    )
    acc = np.asarray(res.accepted)
    assert acc.sum() == n  # exactly one accepted match per class


# ---------------------------------------------------------------- pnp
def test_pnp_ransac_with_outliers(rng):
    N = 80
    X = rng.uniform([-5, -3, 5], [5, 3, 30], (N, 3)).astype(np.float32)
    T_true = se3.exp(jnp.asarray([0.4, -0.2, 0.3, 0.05, -0.02, 0.08], jnp.float32))
    px = np.array(world2pixel(jnp.asarray(X), T_true, INTR))
    n_out = 25
    px[:n_out] += rng.uniform(25, 120, (n_out, 2)) * np.sign(rng.standard_normal((n_out, 2)))
    res = pnp_ransac(
        jnp.asarray(X), jnp.asarray(px), jnp.ones(N, bool), INTR,
        jax.random.PRNGKey(0), iterations=128,
    )
    assert bool(res.ok)
    inl = np.asarray(res.inliers)
    assert inl[n_out:].mean() > 0.9
    assert not inl[:n_out].any()
    err = np.asarray(se3.log(se3.inv(res.T_cw) @ T_true))
    assert np.abs(err).max() < 0.05  # RANSAC-grade; refined by pose LM downstream


def test_pnp_respects_valid_mask(rng):
    N = 40
    X = rng.uniform([-5, -3, 5], [5, 3, 30], (N, 3)).astype(np.float32)
    T_true = se3.exp(jnp.asarray([0.1, 0.0, 0.2, 0.0, 0.03, 0.0], jnp.float32))
    px = np.array(world2pixel(jnp.asarray(X), T_true, INTR))
    # corrupt invalid half completely
    px[20:] = rng.uniform(0, 600, (20, 2))
    valid = np.arange(N) < 20
    res = pnp_ransac(
        jnp.asarray(X), jnp.asarray(px), jnp.asarray(valid), INTR,
        jax.random.PRNGKey(1), iterations=64,
    )
    assert bool(res.ok)
    assert not np.asarray(res.inliers)[20:].any()


# ---------------------------------------------------------------- pgo
def test_pose_graph_closes_loop(rng):
    """Chain of 40 poses with odometry drift + one loop edge back to start."""
    K = 48
    n = 40
    # Ground truth: circle.
    poses_gt = []
    for i in range(n):
        ang = 2 * np.pi * i / n
        r = 5.0
        T_wc = np.eye(4)
        c, s = np.cos(ang), np.sin(ang)
        T_wc[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        T_wc[:3, 3] = [r * (1 - np.cos(ang)), 0, r * np.sin(ang)]
        poses_gt.append(np.linalg.inv(T_wc))
    poses_gt = np.stack(poses_gt).astype(np.float32)

    # Odometry with small noise -> accumulated drift.
    rel_meas = []
    est = [poses_gt[0]]
    for i in range(1, n):
        rel = poses_gt[i] @ np.linalg.inv(poses_gt[i - 1])
        noise = np.asarray(se3.exp(jnp.asarray(
            (rng.standard_normal(6) * np.array([0.01, 0.01, 0.01, 0.002, 0.002, 0.002])).astype(np.float32)
        )))
        rel_noisy = noise @ rel
        rel_meas.append(rel_noisy)
        est.append(rel_noisy @ est[-1])
    est = np.stack(est)

    drift_before = np.linalg.norm(
        np.linalg.inv(est[-1])[:3, 3] - np.linalg.inv(poses_gt[-1])[:3, 3]
    )
    assert drift_before > 0.05  # the test is meaningful

    # Build the graph: sequential edges with noisy measurements + one exact
    # loop edge (n-1 -> 0).
    poses = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    poses[:n] = est
    vertex_valid = np.zeros(K, bool)
    vertex_valid[:n] = True
    fixed = np.zeros(K, bool)
    fixed[0] = True
    fixed[n:] = True

    E = 2 * K
    edge_i = np.zeros(E, np.int32)
    edge_j = np.zeros(E, np.int32)
    edge_meas = np.tile(np.eye(4, dtype=np.float32), (E, 1, 1))
    edge_valid = np.zeros(E, bool)
    for i in range(1, n):
        edge_i[i] = i
        edge_j[i] = i - 1
        edge_meas[i] = rel_meas[i - 1]
        edge_valid[i] = True
    # loop edge: measured relative pose current->loop from ground truth
    edge_i[n] = n - 1
    edge_j[n] = 0
    edge_meas[n] = poses_gt[n - 1] @ np.linalg.inv(poses_gt[0])
    edge_valid[n] = True

    graph = PoseGraph(
        poses=jnp.asarray(poses),
        vertex_valid=jnp.asarray(vertex_valid),
        fixed=jnp.asarray(fixed),
        edge_i=jnp.asarray(edge_i),
        edge_j=jnp.asarray(edge_j),
        edge_meas=jnp.asarray(edge_meas),
        edge_valid=jnp.asarray(edge_valid),
    )
    out = np.asarray(jax.jit(optimize_pose_graph)(graph))

    drift_after = np.linalg.norm(
        np.linalg.inv(out[n - 1])[:3, 3] - np.linalg.inv(poses_gt[n - 1])[:3, 3]
    )
    assert drift_after < drift_before * 0.35
    # untouched vertices stay identity
    np.testing.assert_array_equal(out[n:], poses[n:])
    # fixed vertex 0 untouched
    np.testing.assert_array_equal(out[0], poses[0])
