"""Per-frame cost decomposition of the world circuit at KITTI resolution.

Runs the same workload as bench.py Phase K, but records the host
enqueue-to-enqueue delta per iteration.  With readback lag L and a
device-bound loop, iteration t blocks retiring frame t-L, so delta[t]
estimates the DEVICE cost of frame t-L; aligning deltas by +L against the
KF event log splits the per-frame cost into tracked / keyframe classes.
"""
import os
import sys
import time

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stereoslam_tpu import eval as EV
from stereoslam_tpu.config import CameraConfig, SlamConfig
from stereoslam_tpu.core.system import StereoSlam
from stereoslam_tpu.utils import world as WORLD


def main():
    H, W = 376, 1241
    n_k = int(os.environ.get("N_FRAMES", "180"))
    kseq = WORLD.generate_world_sequence(
        n_frames=n_k, h=H, w=W, fx=320.0 * W / EV.WORLD_W,
        seed=EV.WORLD_SEED, step=EV.WORLD_STEP,
        length=EV.WORLD_LENGTH, width=EV.WORLD_WIDTH,
    )
    kcfg = SlamConfig(
        camera=CameraConfig(
            fx=kseq.fx, fy=kseq.fy, cx=kseq.cx, cy=kseq.cy,
            fx_right=kseq.fx, fy_right=kseq.fy, cx_right=kseq.cx,
            cy_right=kseq.cy, bf=kseq.fx * kseq.baseline,
        ),
        image_height=H, image_width=W,
    )
    kw = {}
    if os.environ.get("NO_BACKEND"):
        kw["enable_backend"] = False
    else:
        kw["enable_backend"] = True
    kw["enable_loop"] = not os.environ.get("NO_LOOP")
    if os.environ.get("INLINE_BA") is not None:
        kw["inline_ba"] = bool(int(os.environ["INLINE_BA"]))
    slam = StereoSlam(kcfg, **kw)
    if not os.environ.get("NO_WARM"):
        slam.warmup_compile()
    lag = slam.readback_lag
    staged = [
        jax.device_put(np.stack([kseq.left[t], kseq.right[t]]).astype(np.uint8))
        for t in range(n_k)
    ]
    jax.block_until_ready(staged[-1])
    warmup = 12
    for t in range(warmup):
        slam.process_staged(staged[t], kseq.timestamps[t])
    slam._drain()
    jax.block_until_ready(slam.fs.T_rk)

    deltas = []
    t_prev = time.perf_counter()
    t0 = t_prev
    n = 0
    for t in range(warmup, n_k):
        ok = slam.process_staged(staged[t], kseq.timestamps[t])
        now = time.perf_counter()
        deltas.append(now - t_prev)
        t_prev = now
        if not ok:
            print(f"LOST at {t}")
            break
        n += 1
    slam._drain()
    jax.block_until_ready(slam.fs.T_rk)
    total = time.perf_counter() - t0
    fps = n / total
    deltas = np.array(deltas) * 1e3

    # KF frame ids from the map table.
    kf_fid = set(int(f) for f in np.asarray(slam.map.kf_frame_id)[: int(slam.map.n_kf)])
    # delta[i] (iteration index i -> frame warmup+i) retires frame warmup+i-lag
    cls = []
    for i in range(len(deltas)):
        f = warmup + i - lag
        cls.append("kf" if f in kf_fid else "trk")
    cls = np.array(cls)
    trk = deltas[cls == "trk"]
    kfd = deltas[cls == "kf"]
    print(f"fps={fps:.1f} total={total:.2f}s n={n} n_kf={int(slam.map.n_kf)} "
          f"kf_rate={len(kfd)/max(len(deltas),1):.2f} lag={lag}")
    for name, d in (("trk", trk), ("kf", kfd), ("all", deltas)):
        if len(d):
            print(f"  {name}: p50={np.percentile(d,50):.1f} p90={np.percentile(d,90):.1f} "
                  f"mean={d.mean():.1f} max={d.max():.1f} sum={d.sum():.0f}ms n={len(d)}")
    # Where does the time actually go: top-10 slowest iterations with class
    order = np.argsort(deltas)[::-1][:10]
    print("  slowest:", [(int(i), cls[i], round(float(deltas[i]), 1)) for i in order])


if __name__ == "__main__":
    main()
