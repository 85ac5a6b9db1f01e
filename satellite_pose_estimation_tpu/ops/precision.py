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


def loss_dtype(x):
    """Dtype for handing model outputs to the loss: bf16/f16 promote to f32
    (stable softmax/log sums), f32 stays f32, f64 STAYS f64 — a hard
    ``astype(float32)`` here would truncate the f64 torch-parity path to a
    ~1e-8 noise floor (see tests/test_training_dynamics_parity.py)."""
    import jax.numpy as jnp

    return jnp.promote_types(x.dtype, jnp.float32)


def to_loss_dtype(x):
    """Cast ``x`` per :func:`loss_dtype`."""
    return x.astype(loss_dtype(x))
