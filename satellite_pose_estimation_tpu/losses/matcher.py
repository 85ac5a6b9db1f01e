"""Hungarian matching of query predictions to keypoint targets — on device.

Cost contract (R1/models/matcher.py:56-88, R2/src/zoo/rtdetr/matcher.py):
    C[q, t] = cost_pts * L1(points_q, landmarks_t) + cost_class * (-prob_q[label_t])
solved exactly per image with the device LSAP kernel (ops/hungarian.py),
removing the per-step GPU->CPU scipy sync of the reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.hungarian import hungarian
from ..ops.precision import to_loss_dtype


def hungarian_match(pred_logits, pred_points, tgt_labels, tgt_points,
                    cost_class=1.0, cost_pts=5.0, use_focal=False,
                    focal_alpha=0.25, focal_gamma=2.0):
    """Batched optimal matching.

    Args:
        pred_logits: (B, Q, C) raw logits.
        pred_points: (B, Q, 2) normalized points.
        tgt_labels:  (B, T) int target class ids.
        tgt_points:  (B, T, 2) normalized target landmarks.
        use_focal: R2 matcher option — focal-style class cost on sigmoid
            probabilities (R2/src/zoo/rtdetr/matcher.py:79-87).
    Returns:
        query_for_target: (B, T) int32 — matched query per target.
    """
    if use_focal:
        prob = jax.nn.sigmoid(pred_logits)
        taken = jnp.take_along_axis(
            prob[:, :, :], tgt_labels[:, None, :], axis=-1
        )  # (B, Q, T)
        neg_cost = (1 - focal_alpha) * (taken ** focal_gamma) * (
            -jnp.log(jnp.clip(1 - taken, 1e-8))
        )
        pos_cost = focal_alpha * ((1 - taken) ** focal_gamma) * (
            -jnp.log(jnp.clip(taken, 1e-8))
        )
        cclass = pos_cost - neg_cost
    else:
        prob = jax.nn.softmax(pred_logits, axis=-1)
        cclass = -jnp.take_along_axis(prob, tgt_labels[:, None, :], axis=-1)

    cpts = jnp.sum(
        jnp.abs(pred_points[:, :, None, :] - tgt_points[:, None, :, :]), axis=-1
    )  # (B, Q, T)
    C = cost_pts * cpts + cost_class * cclass
    # Matching is not differentiated through (reference runs it in no_grad).
    # bf16 costs promote to f32; f64 stays f64 (an f32 truncation here
    # flips assignments against the torch-parity trajectory, see
    # tests/test_training_dynamics_parity.py).
    C = jax.lax.stop_gradient(to_loss_dtype(C))
    return jax.vmap(hungarian)(C)
