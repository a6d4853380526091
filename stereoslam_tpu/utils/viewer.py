"""Offline trajectory/map visualization.

Replaces the reference's Pangolin viewer thread (reference src/viewer.cpp:
35-101: live 3D map with keyframe frusta + point cloud, and a 2D feature
overlay) with an offline matplotlib renderer — deliberately out of the
compute core: visualization must never sit on the pipeline's critical path
(the reference's own README warns the viewer slows the system,
README.md:89-92).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def plot_trajectory(
    est_T_cw: np.ndarray,
    gt_T_wc: Optional[np.ndarray] = None,
    loop_edges: Sequence[Tuple[int, int]] = (),
    out_path: str = "trajectory.png",
    title: str = "keyframe trajectory (top-down)",
) -> str:
    """Top-down (x/z) trajectory plot with optional ground truth and loop
    edges; the classic KITTI-style figure (reference README.md:94-96)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    est = np.linalg.inv(est_T_cw.astype(np.float64))[:, :3, 3]
    fig, ax = plt.subplots(figsize=(8, 8))
    ax.plot(est[:, 0], est[:, 2], "b-", lw=1.2, label="estimate")
    if gt_T_wc is not None:
        gt = gt_T_wc[:, :3, 3]
        ax.plot(gt[:, 0], gt[:, 2], "k--", lw=0.8, label="ground truth")
    for cur, loop in loop_edges:
        if cur < len(est) and loop < len(est):
            ax.plot(
                [est[cur, 0], est[loop, 0]], [est[cur, 2], est[loop, 2]],
                "r-", lw=0.8, alpha=0.7,
            )
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_aspect("equal")
    ax.legend()
    ax.set_title(title)
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path


def plot_map(
    lm_pos: np.ndarray,
    lm_valid: np.ndarray,
    kf_T_cw: np.ndarray,
    out_path: str = "map.png",
) -> str:
    """Top-down landmark cloud + keyframe positions (viewer.cpp:249-267)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pts = lm_pos[lm_valid]
    kf = np.linalg.inv(kf_T_cw.astype(np.float64))[:, :3, 3]
    fig, ax = plt.subplots(figsize=(8, 8))
    ax.scatter(pts[:, 0], pts[:, 2], s=1, c="gray", alpha=0.4, label="landmarks")
    ax.plot(kf[:, 0], kf[:, 2], "b.-", ms=3, lw=1, label="keyframes")
    ax.set_aspect("equal")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.legend()
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path


class LiveView:
    """Incremental observability during a run (the Viewer role,
    reference viewer.cpp:35-119) without a render thread: the driver calls
    :meth:`update` every N frames *between* device dispatches, so rendering
    never sits on the frame loop's critical path and costs zero when off.

    Writes two files, atomically refreshed in place:
      ``live.png``       — top-down trajectory + landmark cloud + loop edges
      ``live_frame.png`` — current left frame with tracked-feature overlay
    """

    def __init__(self, out_dir: str):
        import os

        self.traj_path = os.path.join(out_dir, "live.png")
        self.frame_path = os.path.join(out_dir, "live_frame.png")

    def update(self, slam, left_img: Optional[np.ndarray] = None) -> None:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        n_kf = int(slam.map.n_kf)
        if n_kf >= 1:
            _, _, T_cw = slam.keyframe_trajectory()
            kf = np.linalg.inv(T_cw.astype(np.float64))[:, :3, 3]
            lm_pos = np.asarray(slam.map.lm_pos)
            lm_ok = np.asarray(slam.map.lm_valid) & ~np.asarray(slam.map.lm_outlier)
            fig, ax = plt.subplots(figsize=(7, 7))
            pts = lm_pos[lm_ok]
            if len(pts):
                ax.scatter(pts[:, 0], pts[:, 2], s=1, c="gray", alpha=0.35)
            ax.plot(kf[:, 0], kf[:, 2], "b-", lw=1.2)
            ax.plot(kf[-1:, 0], kf[-1:, 2], "bo", ms=5)
            for cur, loop in slam.loop_edges:
                if cur < len(kf) and loop < len(kf):
                    ax.plot([kf[cur, 0], kf[loop, 0]], [kf[cur, 2], kf[loop, 2]],
                            "r-", lw=1.0, alpha=0.8)
            ax.set_aspect("equal")
            ax.set_xlabel("x [m]")
            ax.set_ylabel("z [m]")
            ax.set_title(f"{n_kf} keyframes, {len(slam.loop_edges)} loop edges")
            tmp = self.traj_path + ".tmp.png"
            fig.savefig(tmp, dpi=100, bbox_inches="tight")
            plt.close(fig)
            import os

            os.replace(tmp, self.traj_path)

        if left_img is not None:
            xy = np.asarray(slam.fs.tracks.xy)
            ok = np.asarray(slam.fs.tracks.valid)
            fig, ax = plt.subplots(figsize=(10, 10 * left_img.shape[0] / left_img.shape[1]))
            ax.imshow(left_img, cmap="gray", vmin=0, vmax=255)
            if ok.any():
                ax.plot(xy[ok, 0], xy[ok, 1], "g+", ms=5, mew=1)
            ax.set_axis_off()
            tmp = self.frame_path + ".tmp.png"
            fig.savefig(tmp, dpi=100, bbox_inches="tight", pad_inches=0)
            plt.close(fig)
            import os

            os.replace(tmp, self.frame_path)


def draw_features(
    img: np.ndarray, xy: np.ndarray, valid: np.ndarray, out_path: str = "frame.png"
) -> str:
    """2D feature overlay on the current frame (viewer.cpp:111-119)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(12, 4))
    ax.imshow(img, cmap="gray")
    pts = xy[valid]
    ax.plot(pts[:, 0], pts[:, 1], "g+", ms=6)
    ax.set_axis_off()
    fig.savefig(out_path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return out_path
