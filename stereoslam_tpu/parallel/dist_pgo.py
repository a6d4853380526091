"""Edge-sharded global pose-graph optimization.

The pose graph grows with every keyframe (reference loopclosing.cpp:545-566
builds it over ALL keyframes).  ops/pgo.py is already matrix-free — H @ v is
two segment-sums over the edge list — so distribution is natural: shard the
edge list over the mesh's model axis, keep the (small) vertex state
replicated, and psum the per-shard contributions of b, the Jacobi
preconditioner blocks, and every CG Hv product.  Per CG iteration the wire
cost is one psum of (K, 6) floats over ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from stereoslam_tpu.ops import se3
from stereoslam_tpu.ops.pgo import PoseGraph, _edge_jacobians, _inv6x6


def optimize_pose_graph_sharded(
    graph: PoseGraph,
    mesh: Mesh,
    model_axis: str = "model",
    gn_iters: int = 20,
    cg_iters: int = 64,
    damping: float = 1e-6,
) -> jnp.ndarray:
    """Sharded variant of :func:`stereoslam_tpu.ops.pgo.optimize_pose_graph`.

    Edge arrays must have length divisible by the model-axis size (pad with
    ``edge_valid=False`` rows pointing at vertex 0).
    """
    K = graph.poses.shape[0]
    E = graph.edge_valid.shape[0]
    n_shards = mesh.shape[model_axis]
    assert E % n_shards == 0, "pad the edge list to a multiple of the shard count"

    free = graph.vertex_valid & ~graph.fixed

    def local(poses, free_v, e_i, e_j, meas, e_valid):
        dt = poses.dtype
        ew = e_valid.astype(dt)
        meas_inv = se3.inv(meas)
        # Per-shard one-hot vertex selection (local edges x global vertices):
        # S @ v gathers, S.T @ y scatter-adds — MXU matmuls, no scatters.
        S_i = jax.nn.one_hot(e_i, K, dtype=dt)
        S_j = jax.nn.one_hot(e_j, K, dtype=dt)

        def gn_step(poses, _):
            T_i = (S_i @ poses.reshape(K, 16)).reshape(-1, 4, 4)
            T_j = (S_j @ poses.reshape(K, 16)).reshape(-1, 4, 4)
            r, J_i, J_j = jax.vmap(_edge_jacobians)(T_i, T_j, meas_inv)
            J_i = J_i * ew[:, None, None]
            J_j = J_j * ew[:, None, None]

            b_part = S_i.T @ -jnp.einsum("eki,ek->ei", J_i, r)
            b_part += S_j.T @ -jnp.einsum("eki,ek->ei", J_j, r)
            b = jax.lax.psum(b_part, model_axis)
            b = jnp.where(free_v[:, None], b, 0.0)

            D_part = (S_i.T @ jnp.einsum("eki,ekj->eij", J_i, J_i).reshape(-1, 36))
            D_part += (S_j.T @ jnp.einsum("eki,ekj->eij", J_j, J_j).reshape(-1, 36))
            D = jax.lax.psum(D_part.reshape(K, 6, 6), model_axis)
            M_inv = _inv6x6(D + (damping + 1e-4) * jnp.eye(6, dtype=dt))

            def Hv(v):
                v = jnp.where(free_v[:, None], v, 0.0)
                a = jnp.einsum("ekl,el->ek", J_i, S_i @ v) + jnp.einsum(
                    "ekl,el->ek", J_j, S_j @ v
                )
                out = S_i.T @ jnp.einsum("eki,ek->ei", J_i, a)
                out += S_j.T @ jnp.einsum("eki,ek->ei", J_j, a)
                out = jax.lax.psum(out, model_axis) + damping * v
                return jnp.where(free_v[:, None], out, 0.0)

            def precond(v):
                return jnp.where(free_v[:, None], jnp.einsum("kij,kj->ki", M_inv, v), 0.0)

            # psum'd scalars are replicated, so the early-exit condition is
            # identical on every shard — safe inside shard_map.
            z0 = precond(b)
            rz0 = jnp.vdot(b, z0)

            def cg_cond(c):
                _, _, _, rz, k = c
                return (k < cg_iters) & (rz > 1e-12 * rz0)

            def cg_body(c):
                x, rr, p, rz, k = c
                Hp = Hv(p)
                alpha = rz / jnp.maximum(jnp.vdot(p, Hp), 1e-20)
                x = x + alpha * p
                rr = rr - alpha * Hp
                z = precond(rr)
                rz_new = jnp.vdot(rr, z)
                beta = rz_new / jnp.maximum(rz, 1e-20)
                p = z + beta * p
                return (x, rr, p, rz_new, k + 1)

            x0 = jnp.zeros((K, 6), dt)
            dx, _, _, _, _ = jax.lax.while_loop(
                cg_cond, cg_body, (x0, b, z0, rz0, jnp.int32(0))
            )
            new_poses = se3.exp(dx) @ poses
            return jnp.where(free_v[:, None, None], new_poses, poses), None

        poses, _ = jax.lax.scan(gn_step, poses, None, length=gn_iters)
        poses_on = se3.orthonormalize(poses)
        return jnp.where(free_v[:, None, None], poses_on, poses)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(), P(),                                  # vertices replicated
            P(model_axis), P(model_axis), P(model_axis), P(model_axis),
        ),
        out_specs=P(),
        check_vma=False,
    )
    return fn(
        graph.poses, free, graph.edge_i, graph.edge_j, graph.edge_meas, graph.edge_valid
    )
