"""One-model-per-chip checkpoint ensemble (SURVEY §2.3 ensembling row):
sharded vmapped forward must equal the serial per-checkpoint loop."""
import jax
import jax.numpy as jnp
import numpy as np

from satellite_pose_estimation_tpu.models.detr import (
    DETRConfig,
    DETRKeypointModel,
)
from satellite_pose_estimation_tpu.parallel.ensemble import (
    ensemble_apply,
    stack_variable_trees,
)
from satellite_pose_estimation_tpu.parallel.mesh import create_mesh

TINY = DETRConfig(backbone="resnet18", hidden_dim=32, nheads=4, enc_layers=1,
                  dec_layers=2, dim_feedforward=64, num_queries=16,
                  dropout=0.0)


def test_ensemble_matches_serial_loop(rng):
    model = DETRKeypointModel(TINY)
    x = jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32)
    trees = [model.init(jax.random.PRNGKey(s), x, train=False)
             for s in range(4)]

    serial = [model.apply(v, x, train=False)["pred_points"] for v in trees]

    stacked = stack_variable_trees(trees)
    out = ensemble_apply(model, stacked, x, mesh=None, train=False)
    for k in range(4):
        np.testing.assert_allclose(np.asarray(out["pred_points"][k]),
                                   np.asarray(serial[k]), rtol=2e-5,
                                   atol=1e-5)


def test_ensemble_sharded_over_mesh(rng):
    assert len(jax.devices()) == 8
    mesh = create_mesh(8)
    model = DETRKeypointModel(TINY)
    x = jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32)
    trees = [model.init(jax.random.PRNGKey(s), x, train=False)
             for s in range(8)]
    stacked = stack_variable_trees(trees)
    out = ensemble_apply(model, stacked, x, mesh=mesh, train=False)
    assert out["pred_points"].shape[0] == 8
    serial0 = model.apply(trees[0], x, train=False)["pred_points"]
    serial7 = model.apply(trees[7], x, train=False)["pred_points"]
    np.testing.assert_allclose(np.asarray(out["pred_points"][0]),
                               np.asarray(serial0), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["pred_points"][7]),
                               np.asarray(serial7), rtol=2e-5, atol=1e-5)
