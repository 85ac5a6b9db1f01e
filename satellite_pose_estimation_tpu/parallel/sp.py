"""Sequence parallelism: shard transformer activations along the token axis.

Complements parallel/tp.py (which lays out *parameters*): under a
``sequence_sharding(mesh, axis)`` context, every encoder block constrains
its (B, T, D) activations to ``P(None, axis, None)`` so the LayerNorm /
FFN / residual segments run on 1/n of the tokens per device — the
Megatron-SP layout, here expressed as GSPMD sharding constraints instead
of hand-written all-gather/reduce-scatter pairs. XLA's partitioner
converts the surrounding collectives (the attention core still needs the
full sequence; GSPMD inserts the gather) and fuses them with the per-chip
compute.

Usage (trace-time context — enter it around the ``jit`` call whose traced
program should carry the constraints):

    with sequence_sharding(mesh, "model"):
        out = jax.jit(model.apply)(variables, x)

No reference counterpart: R1/R2 scale by DDP only
(R2/src/misc/dist.py:23-51); this is a TPU-native capability extension.
"""
from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_state = threading.local()


@contextmanager
def sequence_sharding(mesh: Mesh, axis: str = "model"):
    """Activate token-axis sharding constraints for models traced inside."""
    if axis not in mesh.axis_names:
        raise ValueError(f"mesh has axes {mesh.axis_names}, no '{axis}'")
    prev = getattr(_state, "ctx", None)
    _state.ctx = (mesh, axis)
    try:
        yield
    finally:
        _state.ctx = prev


def active() -> Optional[Tuple[Mesh, str]]:
    return getattr(_state, "ctx", None)


def constrain_seq(x):
    """Constrain a (B, T, D) activation to token-axis sharding when a
    sequence_sharding context is active; identity otherwise (and for
    non-rank-3 values). Call sites: transformer encoder block boundaries."""
    ctx = active()
    if ctx is None or getattr(x, "ndim", 0) != 3:
        return x
    mesh, axis = ctx
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(None, axis, None))
    )
