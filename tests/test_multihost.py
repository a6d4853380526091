"""Multi-host (multi-process) distribution tests.

Spawns two real OS processes that join a ``jax.distributed`` runtime over a
TCP coordinator, form one 8-device global mesh (4 virtual CPU devices per
process), and run the sharded loop-closure DB search and the sharded Schur
BA with cross-process collectives (Gloo on CPU; ICI/DCN on TPU pods).
This is the BASELINE.md "N>=2 hosts" capability; the reference has no
multi-process story at all (SURVEY.md §2: shared-memory pthreads only).
"""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_dist_lcd_and_ba(tmp_path):
    port = _free_port()
    nproc = 2
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_multihost_worker.py")

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo + os.pathsep + os.path.join(repo, "tests") + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )

    procs = []
    outs = []
    for pid in range(nproc):
        out = tmp_path / f"result_{pid}.json"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, worker, str(pid), str(nproc), str(port), str(out)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors="replace"))

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{logs[pid][-3000:]}"
        assert out.exists(), f"worker {pid} wrote no result:\n{logs[pid][-3000:]}"
        r = json.loads(out.read_text())
        assert r["ok"] and r["n_dev"] == 8
        assert r["best_id"] == 17
        assert r["n_suspect"] >= 1
        assert r["ba_cam_agreement"] < 1e-3
        assert r["ba_gt_err"] < 5e-3
