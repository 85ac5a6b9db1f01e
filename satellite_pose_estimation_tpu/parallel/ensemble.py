"""Checkpoint-ensemble parallelism: one model per chip.

The reference's ensemble submission loops checkpoints serially on one GPU
(R1/gen_submission_multi.py:256-265). On a TPU slice the natural layout is
to STACK the K checkpoints' parameter trees along a leading axis, shard that
axis over the mesh and run all K forwards as one vmapped jit program — each
chip holds one model, the batch is replicated, and the (K, B, ...) outputs
come back in a single dispatch (SURVEY §2.3 "model ensembling" row).
"""
from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_variable_trees(variable_trees: List[dict]):
    """Stack K compatible variable trees along a new leading axis."""
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *variable_trees
    )


def ensemble_apply(model, stacked_variables, images,
                   mesh: Optional[Mesh] = None, axis: str = "data",
                   **apply_kwargs):
    """Run all K stacked models on the same image batch.

    Args:
        stacked_variables: tree with leading axis K on every leaf.
        images: (B, H, W, 3), replicated.
        mesh: when given, the K axis is sharded over ``axis`` (one model per
            chip when K == mesh size); without a mesh the vmap runs on one
            device (still a single compiled program instead of K dispatches).
    Returns:
        output tree with a leading K axis.
    """
    def one(variables):
        return model.apply(variables, images, **apply_kwargs)

    fn = jax.vmap(one)
    if mesh is None:
        return fn(stacked_variables)

    # shard_map, NOT vmap-under-pjit: partitioning the vmapped model axis
    # turns convolutions into grouped convs whose SPMD lowering produced
    # wrong numerics on the virtual CPU mesh (and grouped convs are slower
    # on TPU anyway). Under shard_map each device runs its own plain
    # forward over its K/n model shard.
    from jax import shard_map

    K = jax.tree_util.tree_leaves(stacked_variables)[0].shape[0]
    n = mesh.devices.size
    if K % n != 0:
        raise ValueError(
            f"ensemble size {K} must divide the {n}-device mesh; pad the "
            "checkpoint list or run without a mesh"
        )

    def per_device(vars_shard, imgs):
        return jax.vmap(lambda v: model.apply(v, imgs, **apply_kwargs))(
            vars_shard
        )

    fn_sharded = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(axis), P()), out_specs=P(axis),
    )
    model_sharding = NamedSharding(mesh, P(axis))
    stacked_variables = jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, model_sharding), stacked_variables
    )
    images = jax.device_put(images, NamedSharding(mesh, P()))
    return jax.jit(fn_sharded)(stacked_variables, images)


def ensemble_predictions(model, variable_trees, images,
                         mesh: Optional[Mesh] = None):
    """Convenience: (K checkpoints, one batch) -> stacked host outputs."""
    stacked = stack_variable_trees([dict(v) for v in variable_trees])
    out = ensemble_apply(model, stacked, jnp.asarray(images), mesh=mesh,
                         train=False)
    return jax.tree_util.tree_map(np.asarray, jax.device_get(out))
