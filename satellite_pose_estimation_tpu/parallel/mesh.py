"""Device-mesh data parallelism (jax.sharding + jit SPMD).

TPU-native replacement for the reference's DDP-over-NCCL layer
(R1/utils/misc.py:415-440, R2/src/misc/dist.py): instead of process groups
and explicit all_reduce calls, we lay out a 1-D ``data`` mesh, shard the
batch across it and replicate parameters; XLA's SPMD partitioner inserts the
gradient psum (DDP equivalent) and cross-replica batch-stat reductions
(SyncBatchNorm equivalent) automatically, riding ICI within a slice.

The same jitted train step runs single-chip (trivial mesh) or multi-chip —
no separate code path, matching how torchrun wraps one worker script.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """Build a 1-D device mesh with exactly ``n_devices`` devices.

    Raises if the backend exposes fewer devices than requested (a silently
    truncated mesh would "pass" multi-chip checks while testing nothing).
    Single-process SPMD only: every device must be addressable from this
    host — multi-host (multi-process) meshes with per-host data sharding are
    out of scope for the one-host v5e-8 target and rejected loudly.
    """
    if jax.process_count() > 1:
        raise NotImplementedError(
            "create_mesh is single-process SPMD (one host driving all chips "
            f"in the slice); got process_count={jax.process_count()}. For "
            "multi-host runs use parallel/multihost.py: init_distributed + "
            "global_mesh + host_sharded_batch."
        )
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but the "
                f"{devices[0].platform} backend exposes only {len(devices)}"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def auto_mesh(*batch_sizes: int, axis: str = "data") -> Optional[Mesh]:
    """Largest data-parallel mesh every given batch size divides, or None
    when that is a single device (the solvers' DDP-equivalent bootstrap;
    R2/src/misc/dist.py warp_model picks world_size the same way)."""
    n = len(jax.devices())
    while n > 1 and any(int(b) % n for b in batch_sizes):
        n -= 1
    return create_mesh(n, axis=axis) if n > 1 else None


def data_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Device-put every array in the batch with its batch axis sharded."""
    out = {}
    for k, v in batch.items():
        if isinstance(v, (str, list, int, float)):
            out[k] = v
            continue
        arr = np.asarray(v)
        out[k] = jax.device_put(arr, data_sharding(mesh, arr.ndim, axis))
    return out


def replicate_tree(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
