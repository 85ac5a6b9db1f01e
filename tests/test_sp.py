"""Sequence parallelism (parallel/sp.py): token-sharded encoder activations
must be numerically identical to the replicated run, alone and combined
with tensor parallelism."""
import numpy as np
import jax
import jax.numpy as jnp

from satellite_pose_estimation_tpu.models.detr import DETRKeypointModel
from satellite_pose_estimation_tpu.train.state import TrainConfig, create_train_state
from satellite_pose_estimation_tpu.parallel.sp import sequence_sharding, active
from satellite_pose_estimation_tpu.parallel.tp import create_mesh_2d, shard_tree_tp

from test_model_train import TINY


def _model_and_vars():
    model = DETRKeypointModel(TINY)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((2, 64, 64, 3), jnp.float32), TrainConfig(),
    )
    return model, {"params": state.params, "batch_stats": state.batch_stats}


def test_sp_forward_parity_and_combined_with_tp():
    assert len(jax.devices()) == 8
    model, variables = _model_and_vars()
    x = jnp.asarray(np.random.RandomState(3).rand(4, 64, 64, 3), jnp.float32)
    ref = model.apply(variables, x, train=False)

    mesh = create_mesh_2d(2, 2)
    variables_tp = shard_tree_tp(variables, mesh)
    fwd = lambda v, xx: model.apply(v, xx, train=False)
    with sequence_sharding(mesh, "model"):
        out = jax.jit(fwd)(variables_tp, x)
    assert active() is None  # context restored
    np.testing.assert_allclose(
        np.asarray(out["pred_logits"]), np.asarray(ref["pred_logits"]),
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_points"]), np.asarray(ref["pred_points"]),
        rtol=2e-4, atol=2e-4,
    )


def test_sp_context_validates_axis():
    import pytest

    mesh = create_mesh_2d(2, 2)
    with pytest.raises(ValueError, match="no 'tokens'"):
        with sequence_sharding(mesh, "tokens"):
            pass
