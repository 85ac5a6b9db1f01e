"""Pipeline parallelism (parallel/pp.py): a 4-stage microbatch pipeline of
real transformer encoder layers must reproduce the sequential composition
exactly, for both n_micro == n_stages and deeper microbatching."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from satellite_pose_estimation_tpu.models.transformer import EncoderLayer
from satellite_pose_estimation_tpu.parallel.pp import (
    pipeline_apply,
    stack_layer_params,
)

D, NHEAD, T = 32, 4, 16


def _layers(n):
    layer = EncoderLayer(d_model=D, nhead=NHEAD, dim_feedforward=64,
                         dropout=0.0)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, T, D))
    pos = jnp.zeros((1, T, D))
    params = [
        layer.init(jax.random.PRNGKey(i), x, pos)["params"] for i in range(n)
    ]
    return layer, params


def _pipe_mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("pipe",))


@pytest.mark.parametrize("n_micro", [4, 8])
def test_pipeline_matches_sequential(n_micro):
    assert len(jax.devices()) == 8
    n_stages = 4
    layer, params = _layers(n_stages)
    rng = np.random.RandomState(0)
    B = 8
    x = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    pos = jnp.asarray(rng.randn(1, T, D) * 0.1, jnp.float32)

    ref = x
    for p in params:
        ref = layer.apply({"params": p}, ref, jnp.broadcast_to(pos, ref.shape))

    def layer_fn(p, xx):
        return layer.apply(
            {"params": p}, xx, jnp.broadcast_to(pos, xx.shape)
        )

    mesh = _pipe_mesh(n_stages)
    stacked = stack_layer_params(params)
    out = pipeline_apply(layer_fn, stacked, x, mesh, axis="pipe",
                         n_micro=n_micro)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_pipeline_rejects_indivisible_batch():
    layer, params = _layers(4)
    mesh = _pipe_mesh(4)
    stacked = stack_layer_params(params)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_apply(
            lambda p, xx: xx, stacked,
            jnp.zeros((6, T, D)), mesh, n_micro=4,
        )
