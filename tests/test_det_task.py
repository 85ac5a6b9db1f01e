"""Detection (box) task: 4-D decoder path + box criterion."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_box_decoder_forward(rng):
    from satellite_pose_estimation_tpu.models.rtdetr_decoder import (
        RTDETRTransformer,
    )

    dec = RTDETRTransformer(
        num_classes=80, hidden_dim=32, num_queries=10, num_decoder_layers=2,
        nhead=4, dim_feedforward=64, box_dim=4,
    )
    feats = [
        jnp.asarray(rng.rand(2, 8, 8, 32), jnp.float32),
        jnp.asarray(rng.rand(2, 4, 4, 32), jnp.float32),
        jnp.asarray(rng.rand(2, 2, 2, 32), jnp.float32),
    ]
    variables = dec.init(jax.random.PRNGKey(0), feats, train=False)
    out, _ = dec.apply(variables, feats, train=False, mutable=["batch_stats"])
    assert out["pred_points"].shape == (2, 10, 4)
    assert out["pred_logits"].shape == (2, 10, 81)
    b = np.asarray(out["pred_points"])
    assert b.min() >= 0 and b.max() <= 1


def test_box_criterion_gradients(rng):
    from satellite_pose_estimation_tpu.losses.det_criterion import (
        DetCriterionConfig,
        set_criterion_boxes,
    )

    B, Q, T, C = 2, 12, 5, 80
    logits = jnp.asarray(rng.randn(B, Q, C), jnp.float32)
    boxes = jnp.asarray(rng.rand(B, Q, 4) * 0.5 + 0.25, jnp.float32)
    tgt_labels = np.full((B, T), -1, np.int32)
    tgt_labels[:, :3] = rng.randint(0, C, (B, 3))
    tgt_boxes = rng.rand(B, T, 4).astype(np.float32) * 0.5 + 0.25

    def loss_fn(lg, bx):
        total, _ = set_criterion_boxes(
            {"pred_logits": lg, "pred_points": bx},
            {"labels": jnp.asarray(tgt_labels),
             "boxes": jnp.asarray(tgt_boxes)},
            DetCriterionConfig(num_classes=C, aux_loss=False),
        )
        return total

    val, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(logits, boxes)
    assert np.isfinite(float(val))
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


def test_box_criterion_perfect_prediction_low_loss(rng):
    from satellite_pose_estimation_tpu.losses.det_criterion import (
        DetCriterionConfig,
        set_criterion_boxes,
    )

    B, Q, T, C = 1, 8, 3, 10
    tgt_labels = np.full((B, T), -1, np.int32)
    tgt_labels[0, :] = [1, 2, 3]
    tgt_boxes = rng.rand(B, T, 4).astype(np.float32) * 0.4 + 0.3

    logits = np.full((B, Q, C), -8.0, np.float32)
    boxes = rng.rand(B, Q, 4).astype(np.float32) * 0.4 + 0.3
    # first 3 queries predict the targets perfectly and confidently
    for t in range(T):
        logits[0, t, tgt_labels[0, t]] = 8.0
        boxes[0, t] = tgt_boxes[0, t]

    cfg = DetCriterionConfig(num_classes=C, aux_loss=False)
    total_good, _ = set_criterion_boxes(
        {"pred_logits": jnp.asarray(logits), "pred_points": jnp.asarray(boxes)},
        {"labels": jnp.asarray(tgt_labels), "boxes": jnp.asarray(tgt_boxes)},
        cfg,
    )
    # Shuffle the boxes away from the targets -> loss must increase.
    total_bad, _ = set_criterion_boxes(
        {"pred_logits": jnp.asarray(logits),
         "pred_points": jnp.asarray(np.roll(boxes, 2, axis=1))},
        {"labels": jnp.asarray(tgt_labels), "boxes": jnp.asarray(tgt_boxes)},
        cfg,
    )
    assert float(total_good) < float(total_bad)
