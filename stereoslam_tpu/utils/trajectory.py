"""Trajectory + loop-edge export/import in the reference's formats.

Matches the output contract of ``System::SaveTrajectory`` (reference
src/system.cpp:153-178: lines of ``kf_id timestamp tx ty tz qx qy qz qw``,
poses as T_wc = inv(T_cw)) and ``System::SaveLoopEdges`` (system.cpp:187-224:
two lines per loop edge — current KF then loop KF), so downstream tooling
built for the reference keeps working.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from stereoslam_tpu.ops import se3

import jax.numpy as jnp


def _pose_to_line(kf_id: int, ts: float, T_cw: np.ndarray) -> str:
    T_wc = np.linalg.inv(T_cw.astype(np.float64))
    t = T_wc[:3, 3]
    q = np.asarray(se3.to_quaternion(jnp.asarray(T_wc[None, :, :].astype(np.float32))))[0]
    return (
        f"{kf_id} {ts:.6f} "
        f"{t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
        f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}"
    )


def save_trajectory(
    path: str,
    kf_ids: Sequence[int],
    timestamps: Sequence[float],
    T_cw: np.ndarray,
) -> None:
    """Write keyframe trajectory sorted by KF id (system.cpp:158-176)."""
    order = np.argsort(np.asarray(kf_ids))
    with open(path, "w") as f:
        for i in order:
            f.write(_pose_to_line(int(kf_ids[i]), float(timestamps[i]), T_cw[i]) + "\n")


def save_loop_edges(
    path: str,
    edges: Sequence[Tuple[int, int]],
    kf_ids: Sequence[int],
    timestamps: Sequence[float],
    T_cw: np.ndarray,
) -> None:
    """Write loop edges: for each (current, loop) pair, the two KF pose lines
    (system.cpp:203-220)."""
    id_to_row = {int(k): i for i, k in enumerate(kf_ids)}
    with open(path, "w") as f:
        for cur, loop in edges:
            for k in (cur, loop):
                i = id_to_row[int(k)]
                f.write(_pose_to_line(int(k), float(timestamps[i]), T_cw[i]) + "\n")


def load_trajectory(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Read a reference-format trajectory file.

    Returns (kf_ids (N,), timestamps (N,), T_wc (N, 4, 4)).
    """
    ids: List[int] = []
    ts: List[float] = []
    poses: List[np.ndarray] = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) != 9:
                continue
            ids.append(int(float(parts[0])))
            ts.append(float(parts[1]))
            t = np.array([float(x) for x in parts[2:5]])
            q = np.array([float(x) for x in parts[5:9]], dtype=np.float32)
            T = np.asarray(
                se3.from_quaternion(jnp.asarray(q), jnp.asarray(t.astype(np.float32)))
            ).astype(np.float64)
            poses.append(T)
    return np.asarray(ids), np.asarray(ts), np.stack(poses) if poses else np.zeros((0, 4, 4))
