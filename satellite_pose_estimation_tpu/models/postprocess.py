"""Postprocessors: model outputs -> original-image-coordinate predictions.

API-parity classes for the reference's PostProcess
(R1/models/detr_speed.py:264-293) and RTDETRPostProcessor
(R2/src/zoo/rtdetr/rtdetr_postprocessor.py:17-136), as thin jittable
functions over batched arrays (no per-image host loop):

* softmax over class logits;
* points denormalized into original-image pixels via the per-image
  clip_bbox: pt * (x2 - x1, y2 - y1) + (x1, y1);
* sigma path: sigmas = exp(pred_sigmas), scaled to pixel^2 by the squared
  crop extent.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def postprocess(outputs, clip_bbox):
    """R1 PostProcess equivalent.

    Args:
        outputs: dict with pred_logits (B, Q, C), pred_points (B, Q, 2).
        clip_bbox: (B, 4) original-image crop boxes.
    Returns:
        dict with probs (B, Q, C) and points (B, Q, 2) in original pixels.
    """
    probs = jax.nn.softmax(outputs["pred_logits"].astype(jnp.float32), -1)
    wh = clip_bbox[:, 2:4] - clip_bbox[:, 0:2]
    points = (
        outputs["pred_points"].astype(jnp.float32) * wh[:, None, :]
        + clip_bbox[:, None, 0:2]
    )
    return {"probs": probs, "points": points}


def postprocess_sigma(outputs, clip_bbox):
    """RTDETRPostProcessor equivalent (landmarker task): adds
    sigmas = exp(pred_sigmas) scaled to original-image pixel^2."""
    out = postprocess(outputs, clip_bbox)
    wh = clip_bbox[:, 2:4] - clip_bbox[:, 0:2]
    sig = jnp.exp(outputs["pred_sigmas"].astype(jnp.float32))
    out["sigmas"] = sig * (wh[:, None, :] ** 2)
    return out


def collect_aux_points(outputs, clip_bbox):
    """Aux decoder layers for the eval log. Shipped-behavior quirk: the
    reference collects the aux layers' RAW pred_logits
    (R2/solver/speed_engine.py:177-179) but stores them under keys named
    aux_points_0..2 (R2/.../speed_dataset.py:417-419 — leftover naming from
    a commented-out pred_pts variant); this mirrors that, returning the raw
    logits per aux layer. clip_bbox is accepted for API symmetry with
    postprocess() and unused, exactly as the reference never denormalizes
    these.

    Returns ``[(layer_index, logits), ...]`` so aux_points_i keys keep the
    ORIGINAL aux layer index even if an aux entry ever lacked pred_logits
    (today every decoder aux layer carries it; the reference enumerates
    aux_outputs directly, so index stability is the eval-log contract)."""
    del clip_bbox
    return [
        (i, jnp.asarray(aux["pred_logits"], jnp.float32))
        for i, aux in enumerate(outputs.get("aux_outputs", []))
        if "pred_logits" in aux
    ]
