"""End-to-end model smoke tests: DETR forward shapes, one train step, and the
multi-device data-parallel path on the virtual CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from satellite_pose_estimation_tpu.models.detr import DETRConfig, DETRKeypointModel
from satellite_pose_estimation_tpu.losses.criterion import CriterionConfig
from satellite_pose_estimation_tpu.train.state import TrainConfig, create_train_state
from satellite_pose_estimation_tpu.train.steps import make_train_step
from satellite_pose_estimation_tpu.data.augment import AugmentConfig
from satellite_pose_estimation_tpu.parallel.mesh import create_mesh, shard_batch


TINY = DETRConfig(
    backbone="resnet18",
    hidden_dim=32,
    nheads=4,
    enc_layers=1,
    dec_layers=2,
    dim_feedforward=64,
    num_queries=16,
    dropout=0.0,
)


def make_batch(rng, B, P=64):
    return {
        "image": rng.randint(0, 255, (B, P, P, 3)).astype(np.uint8),
        "clip_bbox_buf": np.tile(
            np.asarray([4.0, 4.0, 60.0, 60.0], np.float32), (B, 1)
        ),
        "landmarks_buf": (rng.rand(B, 11, 2) * 50 + 5).astype(np.float32),
        "labels": np.tile(np.arange(11, dtype=np.int32), (B, 1)),
    }


def test_forward_shapes(rng):
    model = DETRKeypointModel(TINY)
    x = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out["pred_logits"].shape == (2, 16, 12)
    assert out["pred_points"].shape == (2, 16, 2)
    assert len(out["aux_outputs"]) == TINY.dec_layers - 1
    pts = np.asarray(out["pred_points"])
    assert pts.min() >= 0 and pts.max() <= 1


def test_train_step_decreases_loss(rng):
    model = DETRKeypointModel(TINY)
    cfg = TrainConfig(lr=1e-3, lr_backbone=1e-4)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((2, 64, 64, 3), jnp.float32), cfg,
    )
    aug = AugmentConfig(
        out_size=64, p_hflip=0.0, p_rotate=0.0, p_affine=0.0, p_blur=0.0,
        p_noise=0.0, p_cutout=0.0, p_trunc=0.0,
    )
    step = make_train_step(CriterionConfig(), cfg, aug)
    batch = {k: jnp.asarray(v) for k, v in make_batch(rng, 2).items()}

    losses_hist = []
    for i in range(8):
        state, losses = step(state, batch, jax.random.PRNGKey(i + 1))
        losses_hist.append(float(losses["loss_total"]))
    assert np.isfinite(losses_hist).all()
    assert losses_hist[-1] < losses_hist[0], losses_hist


def test_frozen_bn_affines_never_updated(rng):
    """Torch buffer contract (R1/models/backbone.py:18-54): FrozenBatchNorm
    scale/bias must be BIT-EQUAL after real optimizer steps — zero grads
    alone are not enough, decoupled weight decay would still shrink them."""
    import flax
    from satellite_pose_estimation_tpu.train.state import (
        frozen_param_prefixes,
    )

    model = DETRKeypointModel(TINY)  # default bn="frozen_bn"
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 64, 64, 3), jnp.float32),
        train=False,
    )
    frozen = frozen_param_prefixes(variables)
    assert frozen, "frozen_marker collection missing"

    cfg = TrainConfig(lr=1e-2, weight_decay=0.1)  # aggressive decay
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((2, 64, 64, 3), jnp.float32), cfg,
    )
    flat0 = {
        k: np.asarray(v)
        for k, v in flax.traverse_util.flatten_dict(state.params).items()
    }
    step = make_train_step(CriterionConfig(), cfg, AugmentConfig())
    batch = {k: jnp.asarray(v) for k, v in make_batch(rng, 2).items()}
    for i in range(2):
        state, _ = step(state, batch, jax.random.PRNGKey(i + 1))

    flat1 = flax.traverse_util.flatten_dict(state.params)
    n_frozen = n_moved = 0
    for k, v1 in flat1.items():
        if k[-1] in ("scale", "bias") and k[:-1] in frozen:
            np.testing.assert_array_equal(np.asarray(v1), flat0[k]), k
            n_frozen += 1
        elif not np.array_equal(np.asarray(v1), flat0[k]):
            n_moved += 1
    assert n_frozen > 0 and n_moved > 0


def test_eval_step_logs_raw_aux_logits(rng):
    """Shipped-behavior quirk, reproduced: the eval log's aux_points_N
    entries carry the RAW aux-layer pred_logits — the reference collects
    pred_logits (R2/solver/speed_engine.py:177-179) but stores them under
    point-named keys (R2/.../speed_dataset.py:417-419)."""
    from satellite_pose_estimation_tpu.train.steps import make_eval_step

    model = DETRKeypointModel(TINY)
    state = create_train_state(
        model,
        jax.random.PRNGKey(0),
        jnp.zeros((2, 64, 64, 3), jnp.float32),
        TrainConfig(),
    )
    batch = {
        "image": rng.randint(0, 255, (2, 96, 96, 3)).astype(np.uint8),
        "clip_bbox_buf": np.tile(
            np.asarray([4.0, 4.0, 90.0, 90.0], np.float32), (2, 1)
        ),
        "clip_bbox": np.tile(
            np.asarray([800.0, 500.0, 1100.0, 800.0], np.float32), (2, 1)
        ),
    }
    res = make_eval_step(out_size=64, solver="simple")(state, batch)
    assert "aux_points_0" in res and "aux_points_1" not in res
    aux = np.asarray(res["aux_points_0"])
    # logits (12-way), not 2-D points — the reference's misnamed payload
    assert aux.shape == (2, TINY.num_queries, 12)
    assert aux.dtype == np.float32


def test_multi_device_data_parallel(rng):
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    mesh = create_mesh(8)
    model = DETRKeypointModel(TINY)
    cfg = TrainConfig()
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((2, 64, 64, 3), jnp.float32), cfg,
    )
    aug = AugmentConfig(out_size=64)
    step = make_train_step(CriterionConfig(), cfg, aug)

    from satellite_pose_estimation_tpu.parallel.mesh import replicate_tree

    batch = shard_batch(make_batch(rng, 16), mesh)
    state = replicate_tree(state, mesh)
    state, losses = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(losses["loss_total"]))


def test_create_mesh_rejects_oversubscription():
    import pytest

    with pytest.raises(ValueError, match="exposes only"):
        create_mesh(len(jax.devices()) + 1)


def test_auto_mesh_divisibility():
    """auto_mesh picks the largest device count dividing every batch size,
    or None when only one device fits (solver DDP-equivalent bootstrap)."""
    from satellite_pose_estimation_tpu.parallel.mesh import auto_mesh

    assert auto_mesh(16).devices.size == 8  # 8 virtual devices (conftest)
    assert auto_mesh(12).devices.size == 6
    assert auto_mesh(12, 16).devices.size == 4  # gcd-limited by both
    assert auto_mesh(7).devices.size == 7  # 7 <= 8 devices, divides itself
    assert auto_mesh(11) is None  # prime > device count: only 1 divides
    assert auto_mesh(1) is None
