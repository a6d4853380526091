#!/usr/bin/env python
"""Scaling curves for the sharded kernels (VERDICT r2 #8).

Measures wall time of the three distributed kernels — row-sharded
descriptor search (parallel/dist_lcd.py), landmark-sharded windowed BA
(parallel/dist_ba.py), edge-sharded pose-graph optimization
(parallel/dist_pgo.py) — at 1/2/4/8 shards on realistic shapes
(W=7-KF window, C=2048 landmark slots, K=1536 x 1064 descriptor DB,
reference-scale pose graph), and verifies the sharded results match the
dense single-device kernels to tolerance at every shard count.

Runs unchanged on a real pod slice (it just uses jax.devices()); in this
environment it runs on the virtual host-platform mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), where the TIMES
measure partitioning overhead rather than real ICI speedup — the committed
SCALING.md records both the numbers and that caveat.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/bench_scaling.py [--out SCALING.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Default to the virtual host-platform mesh; set SCALING_ON_DEVICE=1 on a
# real multi-chip slice to measure true ICI scaling with the same harness.
if not os.environ.get("SCALING_ON_DEVICE"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def _time(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from stereoslam_tpu.ops import se3
    from stereoslam_tpu.ops.camera import Intrinsics, world2pixel
    from stereoslam_tpu.ops.pgo import PoseGraph, optimize_pose_graph
    from stereoslam_tpu.ops.schur import BAProblem, solve_window_ba
    from stereoslam_tpu.parallel.dist_ba import solve_window_ba_sharded
    from stereoslam_tpu.parallel.dist_lcd import sharded_descriptor_search
    from stereoslam_tpu.parallel.dist_pgo import optimize_pose_graph_sharded
    from stereoslam_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    intr = Intrinsics.create(320.0, 320.0, 188.0, 120.0)
    results = {"devices": str(jax.devices()[0].platform),
               "n_devices": len(jax.devices()), "kernels": {}}

    # ---- shapes (realistic single-sequence scale) ----
    K_DB, D = 1536, 1064           # descriptor DB (reference: ~740 KFs on K00)
    Wnd, N = 7, 400                # BA window x feature slots
    C = 2048                       # compacted landmark slots
    K_PG = 1536                    # pose-graph vertices (+2x edges)

    # ---- descriptor search ----
    db = rng.standard_normal((K_DB, D)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = jnp.asarray(db[37])
    dbj = jnp.asarray(db)
    valid = jnp.ones(K_DB, bool)
    dense = jax.jit(lambda db, v, q: (db @ q, jnp.argmax(jnp.where(v, db @ q, -1.0))))
    t_dense, (scores, best) = _time(dense, dbj, valid, q, reps=args.reps)
    rows = {"dense": round(t_dense, 3)}
    for s in (1, 2, 4, 8):
        mesh = make_mesh(dp=1, mp=s, devices=jax.devices()[:s])
        f = jax.jit(lambda db, v, q: sharded_descriptor_search(
            db, v, q, jnp.int32(K_DB), 0.92, mesh))
        t, out = _time(f, dbj, valid, q, reps=args.reps)
        assert int(out.best_id) == int(best), (int(out.best_id), int(best))
        rows[f"shards_{s}"] = round(t, 3)
    results["kernels"]["db_scan_1536x1064"] = rows

    # ---- windowed BA ----
    X = rng.uniform([-20, -5, 4], [20, 5, 60], (C, 3)).astype(np.float32)
    cam_T = np.asarray(se3.exp(jnp.asarray(
        (rng.standard_normal((Wnd, 6)) * 0.02).astype(np.float32))))
    # Observations co-sharded with landmark blocks (the layout
    # solve_window_ba_sharded requires — produced upstream by
    # dist_ba.shard_problem); generating for 8 shards nests into every
    # divisor shard count.  Noiseless: with pixel noise, borderline chi2
    # classifications flip with reduction order between layouts and the
    # solutions legitimately diverge, while timing is identical either way.
    Cl, Nl = C // 8, N // 8
    obs_lm = np.zeros((Wnd, N), np.int32)
    for s in range(8):
        obs_lm[:, s * Nl:(s + 1) * Nl] = rng.integers(
            s * Cl, (s + 1) * Cl, (Wnd, Nl))
    px = np.array(world2pixel(jnp.asarray(X)[jnp.asarray(obs_lm)],
                              jnp.asarray(cam_T)[:, None], intr))
    in_bounds = (
        (px[..., 0] > 0) & (px[..., 0] < 376) & (px[..., 1] > 0) & (px[..., 1] < 240)
    )
    prob = BAProblem(
        cam_T=jnp.asarray(cam_T),
        cam_valid=jnp.ones(Wnd, bool),
        cam_fixed=jnp.zeros(Wnd, bool).at[0].set(True),
        lm_pos=jnp.asarray(X + rng.normal(0, 0.01, X.shape).astype(np.float32)),
        lm_valid=jnp.ones(C, bool),
        lm_fixed=jnp.zeros(C, bool),
        obs_px=jnp.asarray(px),
        obs_lm=jnp.asarray(obs_lm),
        obs_valid=jnp.asarray(in_bounds),
    )
    def _cam_err(res):
        # Observations were generated from (cam_T, X) exactly, so the
        # optimum is the generating configuration: every layout must land on
        # it.  (Bitwise dense-vs-sharded equality is NOT expected here —
        # different reduction orders walk different LM/CG paths; the tight
        # cross-layout agreement test lives in tests/test_parallel.py.)
        d = jax.vmap(lambda a, b: se3.log(a @ se3.inv(b)))(
            res.cam_T, jnp.asarray(cam_T))
        return float(jnp.abs(d).max())

    f_dense = jax.jit(lambda p: solve_window_ba(p, intr, rounds=3, iters=8))
    t_dense, res_dense = _time(f_dense, prob, reps=args.reps)
    assert _cam_err(res_dense) < 0.03, _cam_err(res_dense)
    rows = {"dense": round(t_dense, 3)}
    for s in (1, 2, 4, 8):
        mesh = make_mesh(dp=1, mp=s, devices=jax.devices()[:s])
        f = jax.jit(lambda p: solve_window_ba_sharded(
            p, intr, mesh, rounds=3, iters=8))
        t, res = _time(f, prob, reps=args.reps)
        assert _cam_err(res) < 0.03, (s, _cam_err(res))
        rows[f"shards_{s}"] = round(t, 3)
    results["kernels"]["window_ba_7x400_2048lm"] = rows

    # ---- pose-graph optimization ----
    Kv = K_PG
    poses = np.tile(np.eye(4, dtype=np.float32), (Kv, 1, 1))
    for i in range(1, Kv):
        poses[i] = poses[i - 1].copy()
        poses[i, 2, 3] -= 0.5
        poses[i, :3, 3] += rng.normal(0, 0.01, 3)
    edge_i = np.concatenate([np.arange(1, Kv), [Kv - 1]]).astype(np.int32)
    edge_j = np.concatenate([np.arange(0, Kv - 1), [0]]).astype(np.int32)
    meas = np.tile(np.eye(4, dtype=np.float32), (len(edge_i), 1, 1))
    meas[:-1, 2, 3] = -0.5
    meas[-1] = poses[Kv - 1] @ np.linalg.inv(poses[0])  # loop edge
    graph = PoseGraph(
        poses=jnp.asarray(poses),
        vertex_valid=jnp.ones(Kv, bool),
        fixed=jnp.zeros(Kv, bool).at[0].set(True),
        edge_i=jnp.asarray(edge_i),
        edge_j=jnp.asarray(edge_j),
        edge_meas=jnp.asarray(meas),
        edge_valid=jnp.ones(len(edge_i), bool),
    )
    f_dense = jax.jit(lambda g: optimize_pose_graph(g, gn_iters=5))
    t_dense, pg_dense = _time(f_dense, graph, reps=args.reps)
    rows = {"dense": round(t_dense, 3)}
    for s in (1, 2, 4, 8):
        mesh = make_mesh(dp=1, mp=s, devices=jax.devices()[:s])
        f = jax.jit(lambda g: optimize_pose_graph_sharded(g, mesh, gn_iters=5))
        t, pg = _time(f, graph, reps=args.reps)
        np.testing.assert_allclose(np.asarray(pg), np.asarray(pg_dense), atol=5e-3)
        rows[f"shards_{s}"] = round(t, 3)
    results["kernels"]["pgo_1536v_1537e"] = rows

    print(json.dumps(results, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
