"""Multi-host runtime: ``jax.distributed`` initialization and global meshes.

The reference is strictly single-process (its only parallelism is pthreads,
reference backend.h:92); multi-host operation is net-new capability targeted
by BASELINE.md ("near-linear keyframe-throughput scaling ... 1 chip, 1 host,
N>=2 hosts").  The design follows the standard JAX multi-controller model:

- every host process runs the same program and calls :func:`initialize`;
- a global :class:`jax.sharding.Mesh` spans all processes' devices
  (ICI within a host/slice, DCN between hosts);
- the sharded kernels in this package (:mod:`dist_ba`, :mod:`dist_lcd`,
  :mod:`dist_pgo`, :mod:`multiseq`) are written in ``shard_map`` over named
  mesh axes, so they run unchanged on a single-process mesh or a
  multi-process global mesh — the only difference is how the arrays are
  built (:func:`host_local_array`).

On CPU test rigs the collectives ride Gloo; on TPU pods they ride ICI/DCN.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join the multi-process JAX runtime.

    Arguments default to the standard environment variables
    (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``;
    on Cloud TPU all three are auto-detected and may stay ``None``).
    Returns True if a multi-process runtime was initialized, False if the
    configuration describes a single process (no-op).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None

    if coordinator_address is None and num_processes in (None, 1):
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_mesh(
    dp: Optional[int] = None,
    mp: Optional[int] = None,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Mesh:
    """A (data, model) mesh over ALL processes' devices (``jax.devices()``
    is global after :func:`initialize`).  Same axis conventions as
    :func:`stereoslam_tpu.parallel.mesh.make_mesh`."""
    from stereoslam_tpu.parallel.mesh import make_mesh

    return make_mesh(dp=dp, mp=mp, data_axis=data_axis, model_axis=model_axis,
                     devices=jax.devices())


def host_local_array(
    mesh: Mesh, spec: P, local_data: np.ndarray
) -> jax.Array:
    """Assemble a globally-sharded array from this process's shard.

    ``local_data`` is the rows this host owns (for ``P(axis)`` sharding:
    ``global_rows / num_processes`` of them, in process order).  Wraps
    ``jax.make_array_from_process_local_data``.
    """
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), np.asarray(local_data)
    )


def replicated_array(mesh: Mesh, value: np.ndarray) -> jax.Array:
    """Replicate ``value`` (identical on every process) across the mesh."""
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P()), np.asarray(value)
    )


def fetch_replicated(arr: jax.Array) -> np.ndarray:
    """Read a replicated / fully-addressable result on any process."""
    shard = arr.addressable_shards[0]
    return np.asarray(shard.data)


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()
