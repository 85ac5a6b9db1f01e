"""Pipeline parallelism: GPipe-style microbatch pipeline over homogeneous
transformer layers, written as one shard_map program with ppermute
point-to-point transfers riding ICI.

The reference scales by DDP only (R2/src/misc/dist.py:23-51); this is the
TPU-native pipeline axis for when a stack's layers outgrow one chip. The
schedule is the classic loop pipeline ("How to Scale Your Model" recipe):
devices = stages, each holding its layer's parameters (the stacked
parameter tree is sharded along its leading layer axis, so per-stage
weights never leave their chip); microbatches stream through, one hop per
step, for n_micro + n_stages - 1 steps. Bubble fraction
(n_stages-1)/(n_micro+n_stages-1).

All shapes are static: invalid pipeline slots compute garbage and are
masked, which XLA prefers over data-dependent control flow.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def stack_layer_params(layer_params_list):
    """Stack per-layer parameter trees along a new leading 'stage' axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layer_params_list)


def pipeline_apply(
    layer_fn: Callable,
    stacked_params,
    x: jax.Array,
    mesh: Mesh,
    axis: str = "pipe",
    n_micro: int | None = None,
):
    """Apply ``n_stages`` layers in sequence as a microbatch pipeline.

    layer_fn(params_i, x) -> x, same shape (a homogeneous layer, e.g. one
    transformer encoder block). ``stacked_params`` has leading dim equal to
    the mesh's ``axis`` size. ``x`` is the full batch; it is split into
    ``n_micro`` microbatches (default: one per stage). Returns layer_fn
    composed n_stages times over x, bit-comparable to the sequential loop
    (same per-layer math, same dtype).
    """
    n_stages = mesh.shape[axis]
    n_micro = n_micro or n_stages
    B = x.shape[0]
    if B % n_micro:
        raise ValueError(f"batch {B} not divisible into {n_micro} microbatches")
    mb = B // n_micro
    xs = x.reshape(n_micro, mb, *x.shape[1:])
    n_steps = n_micro + n_stages - 1
    fwd_perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def stage_prog(params_my, xs_all):
        # params_my: this stage's layer params (leading stage dim of 1).
        params_my = jax.tree.map(lambda a: a[0], params_my)
        stage = jax.lax.axis_index(axis)

        def step(carry, t):
            recv, outs = carry
            # Stage 0 injects microbatch t (clamped; masked when t >= n_micro
            # only through the output-write guard below). Other stages use
            # what arrived from the previous stage last step.
            inj = xs_all[jnp.clip(t, 0, n_micro - 1)]
            inp = jnp.where(stage == 0, inj, recv)
            out = layer_fn(params_my, inp)
            # Last stage commits microbatch t-(n_stages-1) when valid.
            widx = t - (n_stages - 1)
            valid = jnp.logical_and(stage == n_stages - 1, widx >= 0)
            upd = jax.lax.dynamic_update_index_in_dim(
                outs, out, jnp.maximum(widx, 0), 0
            )
            outs = jnp.where(valid, upd, outs)
            nxt = jax.lax.ppermute(out, axis, fwd_perm)
            return (nxt, outs), None

        outs0 = jnp.zeros((n_micro,) + xs_all.shape[1:], x.dtype)
        recv0 = jnp.zeros_like(xs_all[0])
        (_, outs), _ = jax.lax.scan(
            step, (recv0, outs0), jnp.arange(n_steps)
        )
        # Replicate the result: only the last stage holds real outputs.
        outs = jnp.where(stage == n_stages - 1, outs, jnp.zeros_like(outs))
        return jax.lax.psum(outs, axis)

    specs_p = jax.tree.map(lambda _: P(axis), stacked_params)
    y = shard_map(
        stage_prog,
        mesh=mesh,
        in_specs=(specs_p, P()),
        out_specs=P(),
        check_vma=False,
    )(stacked_params, xs)
    return y.reshape(B, *x.shape[1:])
