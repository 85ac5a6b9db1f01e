"""Model FLOPs counting via XLA cost analysis.

Plays the role of R2's forward-hook GFLOPs counter
(R2/solver/speed_solver.py:29-86, measured at input (2, 3, 256, 256) during
val); here the count comes from the compiled XLA program itself, which
covers every op (the reference's hooks only count convs/linears).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def count_gflops(model, variables, input_shape) -> float:
    """GFLOPs of one forward pass at the given input shape."""
    x = jnp.zeros(input_shape, jnp.float32)

    def fwd(v, x_):
        return model.apply(v, x_, train=False)

    compiled = jax.jit(fwd).lower(variables, x).compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return float(analysis.get("flops", 0.0)) / 1e9
