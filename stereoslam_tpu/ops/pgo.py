"""Global pose-graph optimization: Gauss–Newton with matrix-free CG.

Replaces the reference's g2o pose graph (reference
src/loopclosing.cpp:537-646: one SE3 vertex per keyframe; sequential +
loop ``EdgePoseGraph`` edges with residual
``log(meas^-1 * T_i * T_j^-1)`` (include/myslam/g2o_types.h:161-167);
fixed = {active KFs, loop KF, KF 0}; 20 LM iterations with a direct sparse
solver).

TPU-native design: the graph never materializes a sparse matrix.  Edge
Jacobians come from batched forward-mode autodiff of the residual (exact,
replacing the reference's numeric differentiation), and the normal equations
are solved by preconditioned conjugate gradients where H@v is two
segment-sums over the edge list — an approach that scales to sharded edge
lists across devices (see parallel/).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from stereoslam_tpu.ops import se3


class PoseGraph(NamedTuple):
    poses: jnp.ndarray       # (K, 4, 4) initial T_cw per vertex
    vertex_valid: jnp.ndarray  # (K,) bool
    fixed: jnp.ndarray       # (K,) bool — not updated (gauge + anchors)
    edge_i: jnp.ndarray      # (E,) int32 — "this" vertex
    edge_j: jnp.ndarray      # (E,) int32 — "last"/"loop" vertex
    edge_meas: jnp.ndarray   # (E, 4, 4) measured T_i @ inv(T_j)
    edge_valid: jnp.ndarray  # (E,) bool


def _edge_residual(xi_i, xi_j, T_i, T_j, meas_inv):
    Ti = se3.exp(xi_i) @ T_i
    Tj = se3.exp(xi_j) @ T_j
    return se3.log(meas_inv @ Ti @ se3.inv(Tj))


def _edge_jacobians(T_i, T_j, meas_inv):
    """Residual at xi=0 and exact Jacobians w.r.t. both twists, per edge."""
    z6 = jnp.zeros(6, T_i.dtype)
    r = _edge_residual(z6, z6, T_i, T_j, meas_inv)
    J_i = jax.jacfwd(_edge_residual, argnums=0)(z6, z6, T_i, T_j, meas_inv)
    J_j = jax.jacfwd(_edge_residual, argnums=1)(z6, z6, T_i, T_j, meas_inv)
    return r, J_i, J_j


def _inv6x6(M: jnp.ndarray) -> jnp.ndarray:
    """Batched 6x6 SPD inverse via Cholesky solves."""
    eye = jnp.broadcast_to(jnp.eye(6, dtype=M.dtype), M.shape)
    L = jnp.linalg.cholesky(M)
    y = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    return jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2), y, lower=False
    )


def optimize_pose_graph(
    graph: PoseGraph,
    gn_iters: int = 20,
    cg_iters: int = 64,
    damping: float = 1e-6,
) -> jnp.ndarray:
    """Optimize and return new (K, 4, 4) poses (fixed vertices untouched)."""
    K = graph.poses.shape[0]
    free = graph.vertex_valid & ~graph.fixed
    ew = graph.edge_valid.astype(graph.poses.dtype)
    i_idx = graph.edge_i
    j_idx = graph.edge_j
    meas_inv = se3.inv(graph.edge_meas)

    def gn_step(poses, _):
        T_i = poses[i_idx]
        T_j = poses[j_idx]
        r, J_i, J_j = jax.vmap(_edge_jacobians)(T_i, T_j, meas_inv)  # (E,6),(E,6,6)x2
        r = r * ew[:, None]

        # rhs b = -sum J^T r, scattered to vertices.
        b = jnp.zeros((K, 6), poses.dtype)
        b = b.at[i_idx].add(-jnp.einsum("eki,ek->ei", J_i, r))
        b = b.at[j_idx].add(-jnp.einsum("eki,ek->ei", J_j, r))
        b = jnp.where(free[:, None], b, 0.0)

        # Jacobi preconditioner: per-vertex diagonal blocks.
        JtJ_i = jnp.einsum("eki,e,ekj->eij", J_i, ew, J_i)
        JtJ_j = jnp.einsum("eki,e,ekj->eij", J_j, ew, J_j)
        D = jnp.zeros((K, 6, 6), poses.dtype)
        D = D.at[i_idx].add(JtJ_i)
        D = D.at[j_idx].add(JtJ_j)
        D = D + (damping + 1e-4) * jnp.eye(6, dtype=poses.dtype)
        M_inv = _inv6x6(D)

        def Hv(v):
            v = jnp.where(free[:, None], v, 0.0)
            a = jnp.einsum("ekl,el->ek", J_i, v[i_idx]) + jnp.einsum(
                "ekl,el->ek", J_j, v[j_idx]
            )
            a = a * ew[:, None]
            out = jnp.zeros((K, 6), poses.dtype)
            out = out.at[i_idx].add(jnp.einsum("eki,ek->ei", J_i, a))
            out = out.at[j_idx].add(jnp.einsum("eki,ek->ei", J_j, a))
            out = out + damping * v
            return jnp.where(free[:, None], out, 0.0)

        def precond(v):
            return jnp.where(
                free[:, None], jnp.einsum("kij,kj->ki", M_inv, v), 0.0
            )

        # Preconditioned CG on H dx = b.
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
        r0 = b
        z0 = precond(r0)
        (dx, _, _, _), _ = jax.lax.scan(
            cg_body, (x0, r0, z0, jnp.vdot(r0, z0)), None, length=cg_iters
        )

        new_poses = se3.exp(dx) @ poses
        new_poses = jnp.where(free[:, None, None], new_poses, poses)
        return new_poses, None

    poses, _ = jax.lax.scan(gn_step, graph.poses, None, length=gn_iters)
    # Remove accumulated rotation drift; fixed vertices stay bit-identical.
    poses_on = se3.orthonormalize(poses)
    return jnp.where((graph.vertex_valid & ~graph.fixed)[:, None, None], poses_on, poses)
