"""Tensor parallelism (parallel/tp.py): spec coverage, forward parity of
TP-sharded vs replicated parameters, and a dp x tp train step whose loss
matches the pure-DP step. Runs on the virtual 8-CPU mesh from conftest."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from satellite_pose_estimation_tpu.models.detr import DETRConfig, DETRKeypointModel
from satellite_pose_estimation_tpu.losses.criterion import CriterionConfig
from satellite_pose_estimation_tpu.train.state import TrainConfig, create_train_state
from satellite_pose_estimation_tpu.train.steps import make_train_step
from satellite_pose_estimation_tpu.data.augment import AugmentConfig
from satellite_pose_estimation_tpu.parallel.mesh import (
    create_mesh,
    replicate_tree,
    shard_batch,
)
from satellite_pose_estimation_tpu.parallel.tp import (
    create_mesh_2d,
    shard_tree_tp,
    tp_param_fraction,
    tp_spec,
)

from test_model_train import TINY, make_batch


def _init_state():
    model = DETRKeypointModel(TINY)
    cfg = TrainConfig(use_ema=True)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((2, 64, 64, 3), jnp.float32), cfg,
    )
    return model, cfg, state


def test_tp_spec_rules_hit_the_model():
    model, _, state = _init_state()
    frac = tp_param_fraction(state.params["transformer"])
    # attention + FFN kernels are a substantial share of the transformer
    assert frac > 0.30, f"TP rules shard only {frac:.1%} of transformer params"
    # and the rules must never shard a conv/norm leaf
    flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    for path, leaf in flat:
        s = "/".join(str(getattr(k, "key", k)) for k in path)
        if "conv" in s or "norm" in s or "bn" in s:
            assert tp_spec(path, leaf) == P(), s


def test_tp_forward_parity():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    model, _, state = _init_state()
    x = jnp.asarray(
        np.random.RandomState(0).rand(4, 64, 64, 3), jnp.float32
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    ref = model.apply(variables, x, train=False)

    mesh = create_mesh_2d(2, 2)
    variables_tp = shard_tree_tp(variables, mesh)
    out = jax.jit(
        lambda v, xx: model.apply(v, xx, train=False)
    )(variables_tp, x)
    np.testing.assert_allclose(
        np.asarray(out["pred_logits"]), np.asarray(ref["pred_logits"]),
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_points"]), np.asarray(ref["pred_points"]),
        rtol=2e-4, atol=2e-4,
    )


def test_tp_train_step_matches_dp():
    rng = np.random.RandomState(1)
    raw = make_batch(rng, 8)
    model, cfg, state = _init_state()
    aug = AugmentConfig(out_size=64)
    step = make_train_step(CriterionConfig(), cfg, aug)

    dp_mesh = create_mesh(8)
    s_dp = replicate_tree(state, dp_mesh)
    _, losses_dp = step(s_dp, shard_batch(raw, dp_mesh), jax.random.PRNGKey(5))

    model, cfg, state = _init_state()
    tp_mesh = create_mesh_2d(4, 2)
    s_tp = shard_tree_tp(state, tp_mesh)
    s_tp2, losses_tp = step(
        s_tp, shard_batch(raw, tp_mesh), jax.random.PRNGKey(5)
    )
    np.testing.assert_allclose(
        float(losses_tp["loss_total"]), float(losses_dp["loss_total"]),
        rtol=1e-4,
    )
    # the updated state keeps its TP layout (no resharding mid-training)
    lin1 = s_tp2.params["transformer"]["encoder_layer_0"]["linear1"]["kernel"]
    spec = lin1.sharding.spec
    assert spec == P(None, "model"), spec


def test_create_mesh_2d_rejects_oversubscription():
    import pytest

    with pytest.raises(ValueError, match="exposes only"):
        create_mesh_2d(8, 2)
