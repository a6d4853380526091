"""Public ORB-extraction API: the reference ``ORBextractor`` surface.

The reference exposes three entry points (reference
include/myslam/ORBextractor.h:61-84): ``Detect`` (grid FAST + distribution),
``ScreenAndComputeKPsParams`` (pyramid screening + orientation), and
``CalcDescriptors`` (steered BRIEF).  The equivalents live in the dedicated
kernel modules; this facade groups them for users porting reference code.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from stereoslam_tpu.config import SlamConfig
from stereoslam_tpu.ops.brief import brief_descriptors  # noqa: F401 (re-export)
from stereoslam_tpu.ops.fast import Keypoints, detect_keypoints  # noqa: F401
from stereoslam_tpu.ops.orient import ic_angles  # noqa: F401


class PyramidDescriptors(NamedTuple):
    desc: jnp.ndarray   # (M, 8) uint32 packed BRIEF
    xy: jnp.ndarray     # (M, 2) level-0 coordinates
    cls: jnp.ndarray    # (M,) source feature slot ("class id")
    valid: jnp.ndarray  # (M,) bool — survived border + FAST screening


def extract_pyramid_descriptors(
    img: jnp.ndarray,
    feat_xy: jnp.ndarray,
    feat_valid: jnp.ndarray,
    cfg: SlamConfig,
) -> PyramidDescriptors:
    """Pyramid-expand features and compute oriented BRIEF per level.

    The combined equivalent of the reference's ScreenAndComputeKPsParams +
    CalcDescriptors pipeline as used by loop closing
    (loopclosing.cpp:94-113): each feature is cloned to every pyramid level,
    screened for FAST cornerness and borders at that level, oriented, and
    described on the blurred level image.
    """
    from stereoslam_tpu.core.loopclosing import _pyramid_orb

    desc, xy, cls, valid = _pyramid_orb(img, feat_xy, feat_valid, cfg)
    return PyramidDescriptors(desc=desc, xy=xy, cls=cls, valid=valid)
