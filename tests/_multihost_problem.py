"""Deterministic BA problem for the multi-host test (shared by every worker)."""

import numpy as np
import jax.numpy as jnp

from stereoslam_tpu.ops import se3
from stereoslam_tpu.ops.camera import Intrinsics, world2pixel
from stereoslam_tpu.ops.schur import BAProblem


def make_sharded_problem(n_shards: int, W: int = 5, N: int = 160, C: int = 240):
    """A noise-perturbed BA problem, already laid out so observation column
    block s only references landmark block s (the dist_ba sharding contract,
    see parallel/dist_ba.py shard_problem)."""
    from stereoslam_tpu.parallel.dist_ba import shard_problem

    intr = Intrinsics.create(400.0, 400.0, 320.0, 160.0)
    rng = np.random.default_rng(5)

    xi = np.zeros((W, 6), np.float32)
    xi[:, 2] = -np.arange(W) * 0.5
    cam_T_gt = np.asarray(se3.exp(jnp.asarray(xi)))
    X_gt = rng.uniform([-8, -4, 6], [8, 4, 30], (C, 3)).astype(np.float32)

    obs_lm = rng.integers(0, C, (W, N)).astype(np.int32)
    px = np.zeros((W, N, 2), np.float32)
    for w in range(W):
        px[w] = np.asarray(
            world2pixel(jnp.asarray(X_gt[obs_lm[w]]), jnp.asarray(cam_T_gt[w]), intr)
        )
    valid = (px[..., 0] > 5) & (px[..., 0] < 635) & (px[..., 1] > 5) & (px[..., 1] < 315)

    dx = rng.normal(0, 0.02, (W, 6)).astype(np.float32)
    dx[0] = 0
    cam_T0 = np.asarray(se3.exp(jnp.asarray(dx)) @ jnp.asarray(cam_T_gt))
    X0 = X_gt + rng.normal(0, 0.05, X_gt.shape).astype(np.float32)

    lm_fixed = np.zeros(C, bool)
    lm_fixed[:40] = True
    X0[lm_fixed] = X_gt[lm_fixed]

    prob = BAProblem(
        cam_T=jnp.asarray(cam_T0),
        cam_valid=jnp.ones(W, bool),
        cam_fixed=jnp.zeros(W, bool),
        lm_pos=jnp.asarray(X0),
        lm_valid=jnp.ones(C, bool),
        lm_fixed=jnp.asarray(lm_fixed),
        obs_px=jnp.asarray(px),
        obs_lm=jnp.asarray(obs_lm),
        obs_valid=jnp.asarray(valid),
    )
    return shard_problem(prob, n_shards), intr, cam_T_gt
