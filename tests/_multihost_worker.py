"""Worker process for tests/test_multihost.py — NOT a pytest module.

Runs as one of N cooperating processes: joins the jax.distributed runtime,
builds the global mesh, and exercises the sharded loop-closure database
search (dist_lcd) and the sharded Schur BA (dist_ba) with globally-sharded
arrays assembled from process-local shards.  Writes "OK" plus numeric
evidence to the result file; any assertion failure leaves the file absent.
"""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    out_path = sys.argv[4]

    from stereoslam_tpu.parallel import distributed as dist

    assert dist.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    mesh = dist.global_mesh()  # (1, n_global_devices)
    n_dev = jax.device_count()
    assert n_dev == nproc * jax.local_device_count()

    # ---------------- dist_lcd over the global mesh ----------------
    from stereoslam_tpu.parallel.dist_lcd import sharded_descriptor_search

    K, D = 64, 1064
    rng = np.random.default_rng(11)  # identical on every process
    db = rng.standard_normal((K, D)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    query = db[17] + 0.05 * rng.standard_normal(D).astype(np.float32)
    query /= np.linalg.norm(query)

    rows = K // nproc
    db_g = dist.host_local_array(mesh, P("model", None), db[pid * rows : (pid + 1) * rows])
    valid_g = dist.host_local_array(mesh, P("model"), np.ones(rows, bool))
    q_g = dist.replicated_array(mesh, query)
    max_id = dist.replicated_array(mesh, np.int32(K))

    res = sharded_descriptor_search(db_g, valid_g, q_g, max_id, 0.5, mesh)
    best_id = int(dist.fetch_replicated(res.best_id))
    best_score = float(dist.fetch_replicated(res.best_score))
    n_sus = int(dist.fetch_replicated(res.n_suspect))

    scores = db @ query
    assert best_id == int(np.argmax(scores)) == 17, best_id
    assert abs(best_score - scores.max()) < 1e-5
    assert n_sus == int((scores > 0.5).sum()), n_sus

    # ---------------- dist_ba over the global mesh ----------------
    from _multihost_problem import make_sharded_problem
    from stereoslam_tpu.parallel.dist_ba import solve_window_ba_sharded
    from stereoslam_tpu.ops import se3
    from stereoslam_tpu.ops.schur import solve_window_ba

    prob, intr, cam_gt = make_sharded_problem(n_shards=n_dev)
    W, N = prob.obs_valid.shape
    C = prob.lm_pos.shape[0]
    Cl, Nl = C // n_dev, N // n_dev
    lpd = jax.local_device_count()  # shards per process
    lm_lo, lm_hi = pid * lpd * Cl, (pid + 1) * lpd * Cl
    ob_lo, ob_hi = pid * lpd * Nl, (pid + 1) * lpd * Nl

    g = lambda spec, local: dist.host_local_array(mesh, spec, local)
    prob_g = prob._replace(
        cam_T=dist.replicated_array(mesh, np.asarray(prob.cam_T)),
        cam_valid=dist.replicated_array(mesh, np.asarray(prob.cam_valid)),
        cam_fixed=dist.replicated_array(mesh, np.asarray(prob.cam_fixed)),
        lm_pos=g(P("model", None), np.asarray(prob.lm_pos)[lm_lo:lm_hi]),
        lm_valid=g(P("model"), np.asarray(prob.lm_valid)[lm_lo:lm_hi]),
        lm_fixed=g(P("model"), np.asarray(prob.lm_fixed)[lm_lo:lm_hi]),
        obs_px=g(P(None, "model", None), np.asarray(prob.obs_px)[:, ob_lo:ob_hi]),
        obs_lm=g(P(None, "model"), np.asarray(prob.obs_lm)[:, ob_lo:ob_hi]),
        obs_valid=g(P(None, "model"), np.asarray(prob.obs_valid)[:, ob_lo:ob_hi]),
    )
    res_sh = solve_window_ba_sharded(prob_g, intr, mesh)
    cam_sh = dist.fetch_replicated(res_sh.cam_T)

    # Reference: the unsharded solver on this process's full local copy.
    res_ref = solve_window_ba(prob, intr)
    dT = jax.vmap(lambda a, b: se3.log(a @ se3.inv(b)))(
        jnp.asarray(cam_sh), res_ref.cam_T
    )
    cam_agree = float(np.abs(np.asarray(dT)).max())
    assert cam_agree < 1e-3, cam_agree

    # And both recovered the ground truth.
    dgt = jax.vmap(lambda a, b: se3.log(a @ se3.inv(b)))(
        jnp.asarray(cam_sh), jnp.asarray(cam_gt)
    )
    gt_err = float(np.abs(np.asarray(dgt)).max())
    assert gt_err < 5e-3, gt_err

    with open(out_path, "w") as f:
        json.dump(
            {
                "ok": True,
                "pid": pid,
                "n_dev": n_dev,
                "best_id": best_id,
                "best_score": best_score,
                "n_suspect": n_sus,
                "ba_cam_agreement": cam_agree,
                "ba_gt_err": gt_err,
            },
            f,
        )


if __name__ == "__main__":
    main()
