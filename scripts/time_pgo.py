#!/usr/bin/env python
"""Micro-benchmark: pose-graph optimization wall time on the current device.

Builds a KITTI-00-sized pose graph (K keyframe vertices on a noisy loop,
sequential + a few loop edges) and times optimize_pose_graph.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from stereoslam_tpu.ops import se3
from stereoslam_tpu.ops.pgo import PoseGraph, optimize_pose_graph


def build_graph(K=768, n_loops=16, seed=0):
    rng = np.random.default_rng(seed)
    # Ground-truth poses along a circle (closes a loop).
    th = np.linspace(0, 2 * np.pi, K, endpoint=False)
    R = 60.0
    xyz = np.stack([R * np.sin(th), np.zeros(K), R * (1 - np.cos(th))], -1)
    T_wc = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    T_wc[:, :3, 3] = xyz
    T_cw_gt = np.linalg.inv(T_wc)

    # Drifted initial estimates.
    noise = (rng.standard_normal((K, 6)) * 0.01).astype(np.float32)
    noise[0] = 0
    T_cw = np.asarray(se3.exp(jnp.cumsum(jnp.asarray(noise), 0))) @ T_cw_gt

    edge_i = list(range(1, K))
    edge_j = list(range(0, K - 1))
    for l in range(n_loops):
        a = int(rng.integers(K // 2, K))
        b = int(rng.integers(0, K // 4))
        edge_i.append(a)
        edge_j.append(b)
    E = len(edge_i)
    ei = np.asarray(edge_i, np.int32)
    ej = np.asarray(edge_j, np.int32)
    meas = T_cw_gt[ei] @ np.linalg.inv(T_cw_gt[ej])

    fixed = np.zeros(K, bool)
    fixed[0] = True
    return PoseGraph(
        poses=jnp.asarray(T_cw),
        vertex_valid=jnp.ones(K, bool),
        fixed=jnp.asarray(fixed),
        edge_i=jnp.asarray(ei),
        edge_j=jnp.asarray(ej),
        edge_meas=jnp.asarray(meas.astype(np.float32)),
        edge_valid=jnp.ones(E, bool),
    ), jnp.asarray(T_cw_gt)


def main():
    graph, gt = build_graph()
    fn = jax.jit(lambda g: optimize_pose_graph(g, gn_iters=20, cg_iters=64))
    t0 = time.time()
    out = jax.block_until_ready(fn(graph))
    t_compile = time.time() - t0
    ts = []
    for _ in range(5):
        t0 = time.time()
        jax.block_until_ready(fn(graph))
        ts.append(time.time() - t0)
    err_before = float(jnp.abs(graph.poses[:, :3, 3] - gt[:, :3, 3]).max())
    err_after = float(jnp.abs(out[:, :3, 3] - gt[:, :3, 3]).max())
    print(
        f"K={graph.poses.shape[0]} E={graph.edge_i.shape[0]} "
        f"compile={t_compile:.1f}s run={min(ts)*1e3:.1f}ms "
        f"max|t-err| {err_before:.3f} -> {err_after:.4f} m"
    )


if __name__ == "__main__":
    main()
