"""Matmul precision control.

JAX's default matmul precision executes f32 dot/matmul at reduced (bf16-class)
precision on TPU — and this environment applies the same default on CPU. That
is the right trade for the neural net (we use explicit bf16 there anyway) but
catastrophic for geometry: a 3e-3 error in a rotation matrix is ~0.2deg of
attitude, far above SPEED-score noise. Every geometry entry point is wrapped
with ``highest_precision`` so all dot_general ops it traces run in true f32.
"""
from __future__ import annotations

import functools

import jax


def highest_precision(fn):
    """Decorator: trace ``fn`` under jax.default_matmul_precision('highest')."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
