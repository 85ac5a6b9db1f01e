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
                    cost_class=1.0, cost_pts=5.0, use_focal=False):
    """Batched optimal matching.

    Args:
        pred_logits: (B, Q, C) raw logits.
        pred_points: (B, Q, 2) normalized points.
        tgt_labels:  (B, T) int target class ids.
        tgt_points:  (B, T, 2) normalized target landmarks.
        use_focal: the R2 matcher's ``use_focal_loss`` option, ON in every
            shipped speed recipe via the shared global
            (``use_focal_loss: True`` in
            R2/configs/rtdetr_speed/include/rtdetr_r50vd.yml:60 +
            ``__share__`` in R2/src/zoo/rtdetr/matcher.py:28-30). NOTE:
            unlike upstream lyuwenyu RT-DETR, this fork's matcher does NOT
            apply the alpha/gamma focal weighting to the cost — it only
            switches the probability from softmax to sigmoid and keeps
            cost = -prob[target] (R2/src/zoo/rtdetr/matcher.py:77-99; the
            stored alpha/gamma are never read in forward).
    Returns:
        query_for_target: (B, T) int32 — matched query per target.
    """
    if use_focal:
        prob = jax.nn.sigmoid(pred_logits)
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
