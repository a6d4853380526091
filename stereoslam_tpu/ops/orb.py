"""Public ORB-extraction API: the reference ``ORBextractor`` surface.

The reference exposes three entry points (reference
include/myslam/ORBextractor.h:61-84): ``Detect`` (grid FAST + distribution),
``ScreenAndComputeKPsParams`` (pyramid screening + orientation), and
``CalcDescriptors`` (steered BRIEF).  ``Detect`` lives in
:mod:`stereoslam_tpu.ops.fast`; the screen+describe pipeline — used by loop
closing to pyramid-expand frontend features (loopclosing.cpp:94-113) — is
:func:`pyramid_orb` here.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from stereoslam_tpu.config import SlamConfig
from stereoslam_tpu.ops.brief import brief_descriptors  # noqa: F401 (re-export)
from stereoslam_tpu.ops.fast import Keypoints, detect_keypoints, fast_corner_check_at  # noqa: F401
from stereoslam_tpu.ops.image import build_pyramid, gaussian_blur
from stereoslam_tpu.ops.orient import ic_angles  # noqa: F401


class PyramidDescriptors(NamedTuple):
    desc: jnp.ndarray   # (M, 8) uint32 packed BRIEF
    xy: jnp.ndarray     # (M, 2) level-0 coordinates
    cls: jnp.ndarray    # (M,) source feature slot ("class id")
    valid: jnp.ndarray  # (M,) bool — survived border + FAST screening


def pyramid_orb(
    img: jnp.ndarray, feat_xy: jnp.ndarray, feat_valid: jnp.ndarray, cfg: SlamConfig
) -> PyramidDescriptors:
    """Pyramid-expanded ORB descriptors for one keyframe's features.

    The reference clones each frontend feature to every pyramid level with
    ``class_id = feature index`` (loopclosing.cpp:94-105), screens each clone
    for FAST cornerness + borders at its level (ScreenAndComputeKPsParams,
    ORBextractor.cpp:1083-1129), then computes oriented BRIEF per clone
    (CalcDescriptors, 1180-1226).  Here each level is processed as one
    batch: response maps and blurs are computed once per level, clones are
    gathered together.
    """
    n_levels = cfg.features.n_levels
    scale = cfg.features.scale_factor
    pyr = build_pyramid(img, n_levels, scale)
    N = feat_xy.shape[0]

    descs, xys, clss, valids = [], [], [], []
    cls_ids = jnp.arange(N, dtype=jnp.int32)
    for lvl in range(n_levels):
        level_img = pyr[lvl]
        s = scale**lvl
        xy_l = feat_xy / s
        h, w = level_img.shape
        margin = 20.0
        in_border = (
            (xy_l[:, 0] >= margin)
            & (xy_l[:, 0] < w - margin)
            & (xy_l[:, 1] >= margin)
            & (xy_l[:, 1] < h - margin)
        )
        is_corner = fast_corner_check_at(
            level_img, xy_l, float(cfg.features.min_th_fast)
        )
        ok = feat_valid & in_border & is_corner

        blurred = gaussian_blur(level_img)
        ang = ic_angles(level_img, xy_l)
        d = brief_descriptors(blurred, xy_l, ang)
        descs.append(d)
        xys.append(feat_xy)  # store level-0 coordinates for PnP
        clss.append(cls_ids)
        valids.append(ok)

    return PyramidDescriptors(
        desc=jnp.concatenate(descs, axis=0),
        xy=jnp.concatenate(xys, axis=0),
        cls=jnp.concatenate(clss, axis=0),
        valid=jnp.concatenate(valids, axis=0),
    )


# Backwards-compatible alias (the original facade name).
extract_pyramid_descriptors = pyramid_orb
