"""Map maintenance: landmark-table compaction.

The reference's dynamic map allocates and frees mappoints individually
(reference src/map.cpp:126-175 removes outlier/old mappoints from its
hashmaps, and the allocator reuses the memory).  The TPU-native map is a
fixed-capacity array allocated bump-style (``n_lm`` only grows), so pruned
landmarks — backend outlier unlinking, orphan pruning, loop merges — leave
dead rows behind and a long multi-sequence day can exhaust the table even
though the number of LIVE landmarks is bounded by the active window's
turnover (VERDICT r3 missing #4; SURVEY §7 hard part (c): "capacity +
free-list discipline").

:func:`compact_landmarks` is that discipline: one jitted program that packs
live landmarks into the lowest slots, rewrites every reference (keyframe
feature links + live tracks), and resets ``n_lm`` to the live count — after
which bump allocation continues into the freed tail.  The host triggers it
from the frame loop when the packed ``n_lm`` telemetry crosses a pressure
threshold (core/system.py _retire).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from stereoslam_tpu.core.state import MapState, TrackState


def compact_landmarks(
    m: MapState, tracks: TrackState
) -> Tuple[MapState, TrackState, jnp.ndarray]:
    """Pack live landmarks into the lowest slots and remap all references.

    Live = ``lm_valid & ~lm_outlier``.  Returns (map, tracks, n_freed).
    Stable order (live landmarks keep their relative order, so lm ids stay
    monotone in creation time — the property the BA gauge logic and loop
    re-anchoring rely on only through ``lm_first_kf``, which moves with its
    row).
    """
    L = m.capacity_lm
    keep = m.lm_valid & ~m.lm_outlier
    order = jnp.argsort(~keep, stable=True)          # live rows first
    new_of_old = jnp.zeros(L, jnp.int32).at[order].set(
        jnp.arange(L, dtype=jnp.int32)
    )
    remap = jnp.where(keep, new_of_old, -1)          # old id -> new id or -1

    def remap_idx(idx):
        return jnp.where(idx >= 0, remap[jnp.clip(idx, 0, L - 1)], idx)

    lm_valid = keep[order]
    n_live = jnp.sum(keep.astype(jnp.int32))
    m2 = m._replace(
        lm_pos=m.lm_pos[order],
        lm_valid=lm_valid,
        lm_outlier=jnp.zeros_like(m.lm_outlier),
        lm_first_kf=jnp.where(lm_valid, m.lm_first_kf[order], -1),
        lm_obs_count=jnp.where(lm_valid, m.lm_obs_count[order], 0),
        n_lm=n_live,
        kf_feat_lm=remap_idx(m.kf_feat_lm),
    )
    tracks2 = tracks._replace(lm_idx=remap_idx(tracks.lm_idx))
    return m2, tracks2, m.n_lm - n_live
