"""Model EMA with warmup-ramped decay.

Contract (R2/optim/ema.py:22-100): shadow = FP32 copy of params;
per step: d = decay * (1 - exp(-t / 2000)); shadow = d * shadow + (1-d) * new.
Implemented as a pure pytree transform so it lives inside the jitted train
step (no host sync).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params):
    # copy=True: astype on an f32 param would alias the same buffer, which
    # breaks donation in the jitted train step (double-donate).
    return jax.tree_util.tree_map(
        lambda p: jnp.array(p, jnp.float32, copy=True), params
    )


def ema_update(ema_params, new_params, step, decay=0.9999, tau=2000.0):
    d = decay * (1.0 - jnp.exp(-(step.astype(jnp.float32) + 1.0) / tau))
    return jax.tree_util.tree_map(
        lambda e, p: e * d + p.astype(jnp.float32) * (1.0 - d),
        ema_params,
        new_params,
    )
