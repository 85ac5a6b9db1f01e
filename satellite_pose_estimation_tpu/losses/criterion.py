"""Set-prediction criterion (device-resident, batched, psum-aware).

Replicates both reference criterions:
* R1 SetCriterion (R1/models/detr_speed.py:103-261): weighted CE with
  eos_coef on background, smooth-L1 (beta=1/200) point loss summed over
  matched pairs / num_points, cardinality + class_error metrics, aux-layer
  replication.
* R2 SetCriterion (R2/src/zoo/rtdetr/rtdetr_criterion.py:48-367): plain-L1
  'points' loss and the Laplace-KL 'points_uncert' loss
  L1(pred,gt) * exp(-sigma) + 0.5 * sigma, with weight_dict applied inside.

All branches are fixed-shape; the Hungarian match runs on device. Cross-
replica normalisation of num_points uses lax.pmean when ``axis_name`` is
given (the reference all_reduces num_boxes, R1/models/detr_speed.py:235-237).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.precision import to_loss_dtype
from .matcher import hungarian_match


@dataclasses.dataclass(frozen=True)
class CriterionConfig:
    num_classes: int = 11
    eos_coef: float = 0.1  # R1 default; R2 uses 1e-4
    cost_class: float = 1.0
    cost_pts: float = 5.0
    point_loss: str = "smooth_l1"  # smooth_l1 (R1) | l1 (R2) | uncert (R2 KL)
    smooth_l1_beta: float = 1.0 / 200.0
    weight_ce: float = 1.0
    weight_points: float = 5.0  # R1 pts_loss_coef / R2 loss_bbox weight
    use_focal: bool = False
    aux_loss: bool = True


def _smooth_l1(diff, beta):
    """mmdetection-style smooth L1 (R1/utils/smooth_l1_loss.py:103-121)."""
    ad = jnp.abs(diff)
    return jnp.where(ad < beta, 0.5 * ad * ad / beta, ad - 0.5 * beta)


def _point_term(pred_pts, tgt_pts, sigmas, kind, beta):
    diff = pred_pts - tgt_pts
    if kind == "smooth_l1":
        return _smooth_l1(diff, beta)
    if kind == "l1":
        return jnp.abs(diff)
    if kind == "uncert":
        # Laplace-KL (R2/src/zoo/rtdetr/rtdetr_criterion.py:202-206)
        return jnp.abs(diff) * jnp.exp(-sigmas) + 0.5 * sigmas
    raise ValueError(kind)


def _one_level(outputs, targets, cfg: CriterionConfig, num_points, log: bool,
               q4t=None):
    """``q4t``: optional fixed (B, T) query-for-target assignment. When
    given, the Hungarian matcher is skipped — the CDN denoising branch
    matches positive dn queries to their source targets by construction
    (R2/src/zoo/rtdetr/rtdetr_criterion.py:370-394
    get_cdn_matched_indices; static for the fixed-T speed task)."""
    logits = outputs["pred_logits"]  # (B, Q, C+1)
    points = outputs["pred_points"]  # (B, Q, 2)
    sigmas = outputs.get("pred_sigmas")  # (B, Q, 2) or None
    labels = targets["labels"]  # (B, T)
    landmarks = targets["landmarks"]  # (B, T, 2)
    B, Q, C1 = logits.shape
    T = labels.shape[1]

    if q4t is None:
        q4t = hungarian_match(
            logits, points, labels, landmarks,
            cost_class=cfg.cost_class, cost_pts=cfg.cost_pts,
            use_focal=cfg.use_focal,
        )  # (B, T)

    # --- classification: scatter matched labels into a (B, Q) target map.
    tgt_classes = jnp.full((B, Q), cfg.num_classes, jnp.int32)
    batch_idx = jnp.arange(B)[:, None].repeat(T, 1)
    tgt_classes = tgt_classes.at[batch_idx, q4t].set(labels)

    logp = jax.nn.log_softmax(to_loss_dtype(logits), axis=-1)
    nll = -jnp.take_along_axis(logp, tgt_classes[..., None], axis=-1)[..., 0]
    class_w = jnp.concatenate(
        [jnp.ones((cfg.num_classes,)), jnp.full((1,), cfg.eos_coef)]
    )
    w = class_w[tgt_classes]
    loss_ce = jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-9)

    # --- points on matched pairs
    matched_pts = jnp.take_along_axis(
        points, q4t[..., None].repeat(2, -1), axis=1
    )  # (B, T, 2)
    matched_sig = (
        jnp.take_along_axis(sigmas, q4t[..., None].repeat(2, -1), axis=1)
        if sigmas is not None
        else jnp.zeros_like(matched_pts)
    )
    pt_loss = _point_term(
        to_loss_dtype(matched_pts),
        to_loss_dtype(landmarks),
        to_loss_dtype(matched_sig),
        cfg.point_loss,
        cfg.smooth_l1_beta,
    )
    loss_points = jnp.sum(pt_loss) / num_points

    out = {"loss_ce": loss_ce, "loss_points": loss_points}
    if log:
        # cardinality error (R1/models/detr_speed.py:155-169)
        card_pred = jnp.sum(
            jnp.argmax(logits, -1) != C1 - 1, axis=-1
        ).astype(jnp.float32)
        out["cardinality_error"] = jnp.mean(jnp.abs(card_pred - T))
        # class error: top-1 accuracy of matched queries
        matched_logits = jnp.take_along_axis(
            logits, q4t[..., None].repeat(C1, -1), axis=1
        )
        acc = jnp.mean(
            (jnp.argmax(matched_logits, -1) == labels).astype(jnp.float32)
        )
        out["class_error"] = 100.0 * (1.0 - acc)
    return out


def set_criterion(
    outputs,
    targets,
    cfg: CriterionConfig = CriterionConfig(),
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, dict]:
    """Compute the weighted total loss and the full loss dict.

    Args:
        outputs: model dict with pred_logits/pred_points[/pred_sigmas] and
            optional aux_outputs list.
        targets: dict with labels (B, T), landmarks (B, T, 2) normalized.
        axis_name: mesh data axis for cross-replica num_points normalisation.
    """
    B, T = targets["labels"].shape
    num_points = jnp.asarray(B * T, jnp.float32)
    if axis_name is not None:
        num_points = jax.lax.pmean(num_points, axis_name)
    num_points = jnp.maximum(num_points, 1.0)

    losses = _one_level(outputs, targets, cfg, num_points, log=True)
    total = (
        cfg.weight_ce * losses["loss_ce"]
        + cfg.weight_points * losses["loss_points"]
    )

    if cfg.aux_loss and "aux_outputs" in outputs:
        for i, aux in enumerate(outputs["aux_outputs"]):
            aux_losses = _one_level(aux, targets, cfg, num_points, log=False)
            total = total + (
                cfg.weight_ce * aux_losses["loss_ce"]
                + cfg.weight_points * aux_losses["loss_points"]
            )
            losses[f"loss_ce_{i}"] = aux_losses["loss_ce"]
            losses[f"loss_points_{i}"] = aux_losses["loss_points"]

    # --- CDN denoising branch (R2/src/zoo/rtdetr/rtdetr_criterion.py:
    # 339-366): fixed positive-query<->target matching, num_points scaled
    # by the group count, every decoder layer contributes a dn level.
    if "dn_aux_outputs" in outputs and "dn_meta" in outputs:
        G = int(outputs["dn_meta"]["dn_num_group"])
        # group g's positives sit at queries g*2T + [0, T) by construction
        # (models/denoising.py layout [pos T | neg T] per group)
        q4t_dn = (
            jnp.arange(T, dtype=jnp.int32)[None, :]
            + 2 * T * jnp.arange(G, dtype=jnp.int32)[:, None]
        ).reshape(1, G * T).repeat(B, 0)  # (B, G*T)
        dn_targets = {
            "labels": jnp.tile(targets["labels"], (1, G)),
            "landmarks": jnp.tile(targets["landmarks"], (1, G, 1)),
        }
        num_points_dn = num_points * G
        for i, aux in enumerate(outputs["dn_aux_outputs"]):
            dn_losses = _one_level(aux, dn_targets, cfg, num_points_dn,
                                   log=False, q4t=q4t_dn)
            total = total + (
                cfg.weight_ce * dn_losses["loss_ce"]
                + cfg.weight_points * dn_losses["loss_points"]
            )
            losses[f"loss_ce_dn_{i}"] = dn_losses["loss_ce"]
            losses[f"loss_points_dn_{i}"] = dn_losses["loss_points"]

    losses["loss_total"] = total
    return total, losses


def nf_point_loss(flow, flow_variables, pred_pts, tgt_pts, pred_sigmas):
    """Normalizing-flow residual-density point loss — the reference's
    config-gated RLE-style variant (R2/src/zoo/rtdetr/rtdetr_criterion.py:
    192-218, shipped with nf_loss_test=False):

        sigma = sigmoid(pred_sigmas)
        bar_mu = (pred - gt) / sigma
        nf   = log(sigma) - flow.log_prob(bar_mu)
        logQ = log(sigma / amp) + |gt - pred| / (sqrt(2) * sigma + 1e-9)
        loss = nf + logQ   (per element)

    ``flow`` is a models.real_nvp.RealNVP module with ``flow_variables``.
    Returns the per-pair loss tensor; callers reduce / normalise like the
    other point losses.
    """
    import math

    amp = 1.0 / math.sqrt(2.0 * math.pi)
    sigma = jax.nn.sigmoid(pred_sigmas)
    bar_mu = (pred_pts - tgt_pts) / sigma
    log_phi = flow.apply(flow_variables, bar_mu, method=flow.log_prob)
    nf = jnp.log(sigma) - log_phi[..., None]
    log_q = jnp.log(sigma / amp) + jnp.abs(tgt_pts - pred_pts) / (
        math.sqrt(2.0) * sigma + 1e-9
    )
    return nf + log_q
