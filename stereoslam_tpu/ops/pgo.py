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
    # Exit tolerances sit above the f32 noise floor (~1e-7 relative) — the
    # r5 endurance probe found the previous 1e-12/1e-10 settings NEVER
    # fired, so every correction paid the full 30x512 ceiling (1.3 s at
    # 269 vertices).  cg: preconditioned residual^2 down 1e-6 relative
    # (|r|/|b| ~ 1e-3 -> mm-scale pose error on meter-scale corrections);
    # gn: max twist step below 0.3 mm/mrad.
    cg_rtol: float = 1e-6,
    gn_xtol: float = 3e-4,
) -> jnp.ndarray:
    """Optimize and return new (K, 4, 4) poses (fixed vertices untouched).

    TPU shape: vertex gathers/scatters go through precomputed one-hot
    selection matrices so every CG iteration is four (E,K)x(K,6) MXU matmuls
    instead of scattered adds, and both the GN and CG loops early-exit on
    convergence (the reference's g2o runs a fixed 20 LM iterations,
    loopclosing.cpp:605-606).
    """
    K = graph.poses.shape[0]
    free = graph.vertex_valid & ~graph.fixed
    dt = graph.poses.dtype
    ew = graph.edge_valid.astype(dt)
    meas_inv = se3.inv(graph.edge_meas)
    # One-hot vertex selection: S @ v gathers, S.T @ y scatter-adds.
    S_i = jax.nn.one_hot(graph.edge_i, K, dtype=dt)  # (E, K)
    S_j = jax.nn.one_hot(graph.edge_j, K, dtype=dt)

    def gn_body(carry):
        poses, it, _ = carry
        T_i = (S_i @ poses.reshape(K, 16)).reshape(-1, 4, 4)
        T_j = (S_j @ poses.reshape(K, 16)).reshape(-1, 4, 4)
        r, J_i, J_j = jax.vmap(_edge_jacobians)(T_i, T_j, meas_inv)  # (E,6),(E,6,6)x2
        # ew is {0,1}: folding it into J once weights r, b, D and Hv alike.
        J_i = J_i * ew[:, None, None]
        J_j = J_j * ew[:, None, None]

        # rhs b = -sum J^T r, scattered to vertices via one-hot matmuls.
        b = S_i.T @ -jnp.einsum("eki,ek->ei", J_i, r)
        b += S_j.T @ -jnp.einsum("eki,ek->ei", J_j, r)
        b = jnp.where(free[:, None], b, 0.0)

        # Jacobi preconditioner: per-vertex diagonal blocks.
        JtJ_i = jnp.einsum("eki,ekj->eij", J_i, J_i)
        JtJ_j = jnp.einsum("eki,ekj->eij", J_j, J_j)
        D = (S_i.T @ JtJ_i.reshape(-1, 36)).reshape(K, 6, 6)
        D += (S_j.T @ JtJ_j.reshape(-1, 36)).reshape(K, 6, 6)
        D = D + (damping + 1e-4) * jnp.eye(6, dtype=dt)
        M_inv = _inv6x6(D)

        def Hv(v):
            v = jnp.where(free[:, None], v, 0.0)
            a = jnp.einsum("ekl,el->ek", J_i, S_i @ v) + jnp.einsum(
                "ekl,el->ek", J_j, S_j @ v
            )
            out = S_i.T @ jnp.einsum("eki,ek->ei", J_i, a)
            out += S_j.T @ jnp.einsum("eki,ek->ei", J_j, a)
            out = out + damping * v
            return jnp.where(free[:, None], out, 0.0)

        def precond(v):
            return jnp.where(
                free[:, None], jnp.einsum("kij,kj->ki", M_inv, v), 0.0
            )

        # Preconditioned CG on H dx = b, early-exiting on residual drop.
        z0 = precond(b)
        rz0 = jnp.vdot(b, z0)

        def cg_cond(c):
            _, _, _, rz, k = c
            return (k < cg_iters) & (rz > cg_rtol * rz0)

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
        new_poses = jnp.where(free[:, None, None], new_poses, poses)
        step = jnp.max(jnp.abs(jnp.where(free[:, None], dx, 0.0)))
        return new_poses, it + 1, step

    def gn_cond(carry):
        _, it, step = carry
        return (it < gn_iters) & (step > gn_xtol)

    poses, _, _ = jax.lax.while_loop(
        gn_cond, gn_body, (graph.poses, jnp.int32(0), jnp.asarray(jnp.inf, dt))
    )
    # Remove accumulated rotation drift; fixed vertices stay bit-identical.
    poses_on = se3.orthonormalize(poses)
    return jnp.where((graph.vertex_valid & ~graph.fixed)[:, None, None], poses_on, poses)
