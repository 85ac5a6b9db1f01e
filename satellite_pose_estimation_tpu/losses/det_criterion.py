"""Detection (box) criterion for the COCO task.

Capability parity with the upstream RT-DETR losses the reference retains
(R2 configs/rtdetr/*: losses ['vfl', 'boxes'], matcher cost_class 2 +
cost_bbox 5 + cost_giou 2): Hungarian matching with the focal class cost +
L1 + GIoU box costs, varifocal classification loss, L1 + GIoU box losses.

Targets are fixed-shape padded: boxes (B, T, 4) cxcywh normalized, labels
(B, T) with -1 padding; the pad mask flows through matching (padded rows
get +inf cost) and losses.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.box_ops import box_cxcywh_to_xyxy, generalized_box_iou
from ..ops.hungarian import hungarian


@dataclasses.dataclass(frozen=True)
class DetCriterionConfig:
    num_classes: int = 80
    cost_class: float = 2.0
    cost_bbox: float = 5.0
    cost_giou: float = 2.0
    weight_vfl: float = 1.0
    weight_bbox: float = 5.0
    weight_giou: float = 2.0
    focal_alpha: float = 0.75  # varifocal loss weight (criterion alpha)
    focal_gamma: float = 2.0
    # Matching cost uses upstream RT-DETR's focal-cost alpha/gamma (matcher
    # alpha 0.25, R2 configs/rtdetr/include/rtdetr_r50vd.yml matcher block),
    # distinct from the vfl alpha above. (The fork's own modified matcher
    # cannot run the det task at all — it reads the landmarker's
    # 'landmarks' target key — so the det path reconstructs the upstream
    # semantics its configs name.)
    matcher_alpha: float = 0.25
    matcher_gamma: float = 2.0
    aux_loss: bool = True


def _match(logits, boxes, tgt_labels, tgt_boxes, tgt_mask, cfg):
    prob = jax.nn.sigmoid(logits)
    safe_labels = jnp.maximum(tgt_labels, 0)
    taken = jnp.take_along_axis(prob, safe_labels[:, None, :], axis=-1)
    neg = (1 - cfg.matcher_alpha) * (taken ** cfg.matcher_gamma) * (
        -jnp.log(jnp.clip(1 - taken, 1e-8))
    )
    pos = cfg.matcher_alpha * ((1 - taken) ** cfg.matcher_gamma) * (
        -jnp.log(jnp.clip(taken, 1e-8))
    )
    c_class = pos - neg  # (B, Q, T)

    c_bbox = jnp.sum(
        jnp.abs(boxes[:, :, None, :] - tgt_boxes[:, None, :, :]), -1
    )
    giou = generalized_box_iou(
        box_cxcywh_to_xyxy(boxes), box_cxcywh_to_xyxy(tgt_boxes)
    )
    C = (
        cfg.cost_class * c_class
        + cfg.cost_bbox * c_bbox
        + cfg.cost_giou * (1.0 - giou)
    )
    # Padded targets: constant large cost (keeps LSAP well-posed; their
    # assignments are discarded via tgt_mask).
    C = jnp.where(tgt_mask[:, None, :], C, 1e6)
    return jax.vmap(hungarian)(jax.lax.stop_gradient(C.astype(jnp.float32)))


def _one_level(outputs, targets, cfg, num_boxes, q4t=None):
    """``q4t``: optional fixed assignment (CDN denoising levels — positive
    dn queries match their source targets by construction, cf.
    R2/src/zoo/rtdetr/rtdetr_criterion.py:370-394)."""
    logits = outputs["pred_logits"]  # (B, Q, C) — sigmoid/focal, no bg class
    boxes = outputs["pred_points"]  # (B, Q, 4) cxcywh
    tgt_labels = targets["labels"]  # (B, T), -1 pad
    tgt_boxes = targets["boxes"]  # (B, T, 4)
    tgt_mask = tgt_labels >= 0
    B, Q, C = logits.shape
    T = tgt_labels.shape[1]

    if q4t is None:
        q4t = _match(logits, boxes, tgt_labels, tgt_boxes, tgt_mask, cfg)

    matched_boxes = jnp.take_along_axis(
        boxes, q4t[..., None].repeat(4, -1), axis=1
    )
    m = tgt_mask.astype(jnp.float32)

    l1 = jnp.sum(jnp.abs(matched_boxes - tgt_boxes), -1) * m
    loss_bbox = jnp.sum(l1) / num_boxes

    giou_mat = generalized_box_iou(
        box_cxcywh_to_xyxy(matched_boxes), box_cxcywh_to_xyxy(tgt_boxes)
    )
    giou_diag = jnp.diagonal(giou_mat, axis1=-2, axis2=-1)
    loss_giou = jnp.sum((1.0 - giou_diag) * m) / num_boxes

    # Varifocal loss: IoU-aware classification target on matched queries.
    iou_q = jnp.zeros((B, Q))
    batch_idx = jnp.arange(B)[:, None].repeat(T, 1)
    iou_val = jnp.clip(jnp.where(tgt_mask, giou_diag, 0.0), 0.0, 1.0)
    iou_q = iou_q.at[batch_idx, q4t].max(iou_val)
    cls_q = jnp.full((B, Q), -1, jnp.int32)
    cls_q = cls_q.at[batch_idx, q4t].set(jnp.where(tgt_mask, tgt_labels, -1))
    onehot = jax.nn.one_hot(jnp.maximum(cls_q, 0), C) * (cls_q >= 0)[..., None]
    target_score = onehot * iou_q[..., None]

    prob = jax.nn.sigmoid(logits.astype(jnp.float32))
    weight = (
        cfg.focal_alpha * (prob ** cfg.focal_gamma) * (1 - onehot)
        + target_score
    )
    bce = -(
        target_score * jnp.log(jnp.clip(prob, 1e-8))
        + (1 - target_score) * jnp.log(jnp.clip(1 - prob, 1e-8))
    )
    loss_vfl = jnp.sum(bce * weight) / num_boxes

    return {
        "loss_vfl": loss_vfl,
        "loss_bbox": loss_bbox,
        "loss_giou": loss_giou,
    }


def set_criterion_boxes(outputs, targets,
                        cfg: DetCriterionConfig = DetCriterionConfig()
                        ) -> Tuple[jnp.ndarray, dict]:
    num_boxes = jnp.maximum(
        jnp.sum((targets["labels"] >= 0).astype(jnp.float32)), 1.0
    )

    def weighted(l):
        return (
            cfg.weight_vfl * l["loss_vfl"]
            + cfg.weight_bbox * l["loss_bbox"]
            + cfg.weight_giou * l["loss_giou"]
        )

    losses = _one_level(outputs, targets, cfg, num_boxes)
    total = weighted(losses)
    if cfg.aux_loss and "aux_outputs" in outputs:
        for i, aux in enumerate(outputs["aux_outputs"]):
            al = _one_level(aux, targets, cfg, num_boxes)
            total = total + weighted(al)
            losses[f"loss_vfl_{i}"] = al["loss_vfl"]
            losses[f"loss_bbox_{i}"] = al["loss_bbox"]

    # CDN denoising levels: fixed positive<->target matching, num_boxes
    # scaled by the group count (R2 rtdetr_criterion.py:339-366; padded
    # targets stay masked out via their -1 labels).
    if "dn_aux_outputs" in outputs and "dn_meta" in outputs:
        B, T = targets["labels"].shape
        G = int(outputs["dn_meta"]["dn_num_group"])
        q4t_dn = (
            jnp.arange(T, dtype=jnp.int32)[None, :]
            + 2 * T * jnp.arange(G, dtype=jnp.int32)[:, None]
        ).reshape(1, G * T).repeat(B, 0)
        dn_targets = {
            "labels": jnp.tile(targets["labels"], (1, G)),
            "boxes": jnp.tile(targets["boxes"], (1, G, 1)),
        }
        for i, aux in enumerate(outputs["dn_aux_outputs"]):
            dl = _one_level(aux, dn_targets, cfg, num_boxes * G, q4t=q4t_dn)
            total = total + weighted(dl)
            losses[f"loss_vfl_dn_{i}"] = dl["loss_vfl"]
            losses[f"loss_bbox_dn_{i}"] = dl["loss_bbox"]

    losses["loss_total"] = total
    return total, losses
