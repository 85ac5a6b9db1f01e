"""Contrastive denoising query groups (CDN) for RT-DETR training.

Capability parity with R2/src/zoo/rtdetr/denoising.py:10-146
(get_contrastive_denoising_training_group): build noised positive/negative
label+coordinate query groups with the block-diagonal attention mask.
The speed configs ship with num_denoising 0 (and the reference's forward
hardcodes the groups to None, R2/src/zoo/rtdetr/rtdetr_decoder.py:693-698)
but the capability is wired end-to-end here: the decoder concatenates the
groups ahead of the matching queries, masks self-attention, and the
criterion consumes ``dn_aux_outputs`` with the statically-known positive
indices (losses/criterion.py).

TPU-first: the reference sizes groups by the max target count in the batch
and builds ragged per-image positive-index lists; SPEED targets are always
T=11 per image, so shapes are static by construction
(num_group = num_denoising // T, positives at g*2T + [0, T)) and no
ragged bookkeeping exists.

Query layout per group (reference tile semantics, denoising.py:48-57):
[positive block (T), negative block (T)] repeated num_group times.
Noise is CONTRASTIVE (denoising.py:90-101): per coordinate the magnitude
is u ~ U[0,1) x diff for positives and (u+1) ~ U[1,2) x diff for
negatives — negatives are bounded AWAY from the target — with a random
sign. For 4-D cxcywh boxes diff = 0.5 * wh * box_noise_scale applied in
xyxy space (reference-exact); for the speed task's 2-D points, which have
no wh, diff = 0.1 * box_noise_scale (the fixed base magnitude this port
adopts, in normalized crop units).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _box_cxcywh_to_xyxy(b):
    cxcy, wh = b[..., :2], b[..., 2:]
    return jnp.concatenate([cxcy - wh / 2, cxcy + wh / 2], -1)


def _box_xyxy_to_cxcywh(b):
    lo, hi = b[..., :2], b[..., 2:]
    return jnp.concatenate([(lo + hi) / 2, hi - lo], -1)


def build_denoising_group(
    rng,
    labels: jnp.ndarray,  # (B, T) int32
    points: jnp.ndarray,  # (B, T, box_dim) normalized (2 = xy, 4 = cxcywh)
    class_embed: jnp.ndarray,  # (num_classes + 1, C) embedding table
    num_queries: int,
    num_classes: int,
    num_denoising: int = 100,
    label_noise_ratio: float = 0.5,
    point_noise_scale: float = 1.0,
):
    """Returns (dn_embed (B, 2*G*T, C), dn_points_unact (B, 2*G*T, D),
    attn_mask (N, N) bool [True = blocked], dn_meta) where
    G = num_denoising // T and N = 2*G*T + num_queries.

    Padded targets (detection task): ``labels == -1`` marks pads. Pads
    embed as the table's last row (the reference's padding_idx row,
    denoising.py:36-46), get no label noise, and are excluded from the
    criterion's positive set (the criterion masks them by the same
    labels>=0 test). Group sizing uses the STATIC padded T where the
    reference uses the batch's dynamic max count — same total query
    budget 2*(num_denoising//T)*T ~ 2*num_denoising, static shapes."""
    B, T = labels.shape
    D = points.shape[-1]
    num_group = max(num_denoising // T, 1)
    n_dn = 2 * num_group * T

    k1, k2, k3, k4 = jax.random.split(rng, 4)

    pad = labels < 0  # (B, T) detection-task padding
    labels = jnp.where(pad, num_classes, labels)
    lab = jnp.tile(labels[:, None, :], (1, 2 * num_group, 1))  # (B, 2G, T)
    pts = jnp.tile(points[:, None, :, :], (1, 2 * num_group, 1, 1))

    # label noise: flip to a random class with prob ratio*0.5, positives
    # and negatives alike, never pads (reference denoising.py:62-73)
    flip = jax.random.bernoulli(k1, label_noise_ratio * 0.5, lab.shape)
    flip = flip & ~jnp.tile(pad[:, None, :], (1, 2 * num_group, 1))
    rand_lab = jax.random.randint(k2, lab.shape, 0, num_classes)
    lab = jnp.where(flip, rand_lab, lab)

    # contrastive coordinate noise: |noise| in [0,1)*diff for positives,
    # [1,2)*diff for negatives, random sign per coordinate
    neg = (jnp.arange(2 * num_group) % 2).astype(points.dtype)  # 0=pos 1=neg
    neg = neg[None, :, None, None]
    u = jax.random.uniform(k3, pts.shape)
    sign = jax.random.randint(k4, pts.shape, 0, 2).astype(points.dtype) * 2 - 1
    magnitude = (u + neg) * sign  # [0,1) pos / [1,2) neg, signed

    eps = 1e-5
    if D == 4:
        xyxy = _box_cxcywh_to_xyxy(pts)
        diff = jnp.tile(pts[..., 2:] * 0.5, (1, 1, 1, 2)) * point_noise_scale
        xyxy = jnp.clip(xyxy + magnitude * diff, 0.0, 1.0)
        pts_noised = _box_xyxy_to_cxcywh(xyxy)
    else:
        diff = 0.1 * point_noise_scale
        pts_noised = jnp.clip(pts + magnitude * diff, 0.0, 1.0)

    lab = lab.reshape(B, n_dn)
    pts_noised = pts_noised.reshape(B, n_dn, D)

    dn_embed = class_embed[lab]  # (B, n_dn, C)
    dn_points_unact = jnp.log(
        jnp.clip(pts_noised, eps) / jnp.clip(1.0 - pts_noised, eps)
    )

    # Block-diagonal attention mask: matching queries cannot see denoising
    # groups; each group only sees itself (and the matching queries).
    N = n_dn + num_queries
    mask = jnp.zeros((N, N), bool)
    group_size = 2 * T
    for g in range(num_group):
        s, e = g * group_size, (g + 1) * group_size
        # group g may not attend outside itself within the dn region
        mask = mask.at[s:e, :s].set(True)
        mask = mask.at[s:e, e:n_dn].set(True)
    # matching queries may not attend to any dn query
    mask = mask.at[n_dn:, :n_dn].set(True)

    dn_meta = {
        "dn_num_group": num_group,
        "dn_num_split": (n_dn, num_queries),
    }
    return dn_embed, dn_points_unact, mask, dn_meta
