"""Multi-host (multi-process) SPMD support.

The reference's DDP layer discovers ranks from env:// or SLURM and wraps
the model per process (R1/utils/misc.py:415-440, R2/src/misc/dist.py:23-51).
The TPU-native equivalent for a multi-host slice:

* every process calls :func:`init_distributed` (coordinator discovery like
  torchrun's env://), then builds ONE :func:`global_mesh` over all devices
  of the slice;
* each host feeds only its own batch shard —
  :func:`host_sharded_batch` assembles a global jax.Array from
  process-local data (the DistributedSampler replacement: no sampler
  object, the data split IS the sharding);
* per-host eval logs merge with :func:`allgather_object` (the
  `all_gather_object` / `process_allgather` equivalent,
  R2/src/misc/dist.py:169-182).

Single-host meshes should keep using parallel/mesh.py; that path
deliberately rejects multi-process runs and points here.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids=None):
    """jax.distributed.initialize with env:// style fallback discovery.

    Environment variables (torchrun-compatible names): COORDINATOR_ADDRESS
    (or MASTER_ADDR:MASTER_PORT), WORLD_SIZE, RANK.
    """
    if coordinator_address is None:
        coordinator_address = os.environ.get("COORDINATOR_ADDRESS")
        if coordinator_address is None and "MASTER_ADDR" in os.environ:
            coordinator_address = (
                f"{os.environ['MASTER_ADDR']}:"
                f"{os.environ.get('MASTER_PORT', '29500')}"
            )
    if num_processes is None and "WORLD_SIZE" in os.environ:
        num_processes = int(os.environ["WORLD_SIZE"])
    if process_id is None and "RANK" in os.environ:
        process_id = int(os.environ["RANK"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def global_mesh(axis: str = "data") -> Mesh:
    """1-D mesh over every device in the slice (all processes)."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def host_sharded_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Assemble a global batch from per-process local shards.

    Each process passes ONLY its local portion (global_batch /
    process_count rows); the returned jax.Arrays are globally sharded over
    the mesh's data axis. Non-array leaves pass through.
    """
    out = {}
    for k, v in batch.items():
        if isinstance(v, (str, list, int, float)):
            out[k] = v
            continue
        arr = np.asarray(v)
        sharding = NamedSharding(mesh, P(axis, *([None] * (arr.ndim - 1))))
        out[k] = jax.make_array_from_process_local_data(sharding, arr)
    return out


def allgather_object(tree):
    """Gather a pytree of host values from every process to every process
    (stacked along a new leading process axis) — the reference's
    all_gather_object for merging per-host eval logs."""
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree)


def replicate_global(tree, mesh: Mesh):
    """Replicate host values identically across all processes/devices."""
    from jax.experimental import multihost_utils

    del mesh
    return multihost_utils.broadcast_one_to_all(tree)
