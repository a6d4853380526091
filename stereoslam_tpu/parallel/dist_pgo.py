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
        ew = e_valid.astype(poses.dtype)
        meas_inv = se3.inv(meas)

        def gn_step(poses, _):
            T_i = poses[e_i]
            T_j = poses[e_j]
            r, J_i, J_j = jax.vmap(_edge_jacobians)(T_i, T_j, meas_inv)
            r = r * ew[:, None]

            b_part = jnp.zeros((K, 6), poses.dtype)
            b_part = b_part.at[e_i].add(-jnp.einsum("eki,ek->ei", J_i, r))
            b_part = b_part.at[e_j].add(-jnp.einsum("eki,ek->ei", J_j, r))
            b = jax.lax.psum(b_part, model_axis)
            b = jnp.where(free_v[:, None], b, 0.0)

            D_part = jnp.zeros((K, 6, 6), poses.dtype)
            D_part = D_part.at[e_i].add(jnp.einsum("eki,e,ekj->eij", J_i, ew, J_i))
            D_part = D_part.at[e_j].add(jnp.einsum("eki,e,ekj->eij", J_j, ew, J_j))
            D = jax.lax.psum(D_part, model_axis)
            M_inv = _inv6x6(D + (damping + 1e-4) * jnp.eye(6, dtype=poses.dtype))

            def Hv(v):
                v = jnp.where(free_v[:, None], v, 0.0)
                a = jnp.einsum("ekl,el->ek", J_i, v[e_i]) + jnp.einsum(
                    "ekl,el->ek", J_j, v[e_j]
                )
                a = a * ew[:, None]
                out = jnp.zeros((K, 6), poses.dtype)
                out = out.at[e_i].add(jnp.einsum("eki,ek->ei", J_i, a))
                out = out.at[e_j].add(jnp.einsum("eki,ek->ei", J_j, a))
                out = jax.lax.psum(out, model_axis) + damping * v
                return jnp.where(free_v[:, None], out, 0.0)

            def precond(v):
                return jnp.where(free_v[:, None], jnp.einsum("kij,kj->ki", M_inv, v), 0.0)

            def cg_body(carry, _):
                x, rr, p, rz = carry
                Hp = Hv(p)
                alpha = rz / jnp.maximum(jnp.vdot(p, Hp), 1e-20)
                x = x + alpha * p
                rr = rr - alpha * Hp
                z = precond(rr)
                rz_new = jnp.vdot(rr, z)
                beta = rz_new / jnp.maximum(rz, 1e-20)
                p = z + beta * p
                return (x, rr, p, rz_new), None

            x0 = jnp.zeros((K, 6), poses.dtype)
            z0 = precond(b)
            (dx, _, _, _), _ = jax.lax.scan(
                cg_body, (x0, b, z0, jnp.vdot(b, z0)), None, length=cg_iters
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
