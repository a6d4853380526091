"""Device-mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: Optional[int] = None,
    mp: Optional[int] = None,
    data_axis: str = "data",
    model_axis: str = "model",
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Defaults: all devices on the model axis (the descriptor-DB / landmark
    sharding axis), dp=1.
    """
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if dp is None and mp is None:
        dp, mp = 1, n
    elif dp is None:
        dp = n // mp
    elif mp is None:
        mp = n // dp
    if dp * mp != n:
        raise ValueError(f"mesh {dp}x{mp} != {n} devices")
    arr = np.asarray(devs).reshape(dp, mp)
    return Mesh(arr, (data_axis, model_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
