"""Contrastive denoising query groups (CDN) for RT-DETR training.

Capability parity with R2/src/zoo/rtdetr/denoising.py:10-146
(get_contrastive_denoising_training_group): build noised positive/negative
label+point query groups with the block-diagonal attention mask. The speed
configs ship with num_denoising 0 (the exercised path), but the capability
is provided for the detection task and ablations.

TPU-first: the reference sizes groups by the max target count in the batch;
SPEED targets are always 11 per image, so shapes are static by construction
(num_group = num_denoising // num_targets).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def build_denoising_group(
    rng,
    labels: jnp.ndarray,  # (B, T) int32
    points: jnp.ndarray,  # (B, T, 2) normalized
    class_embed: jnp.ndarray,  # (num_classes + 1, C) embedding table
    num_queries: int,
    num_classes: int,
    num_denoising: int = 100,
    label_noise_ratio: float = 0.5,
    point_noise_scale: float = 1.0,
):
    """Returns (dn_embed (B, 2*G*T, C), dn_points_unact (B, 2*G*T, 2),
    attn_mask (N, N), dn_meta) where G = num_denoising // T and
    N = 2*G*T + num_queries. Positive halves carry noised GT; negative
    halves carry stronger noise (contrastive)."""
    B, T = labels.shape
    num_group = max(num_denoising // T, 1)
    n_dn = 2 * num_group * T  # positives then negatives per group

    k1, k2, k3 = jax.random.split(rng, 3)

    lab = jnp.tile(labels[:, None, :], (1, 2 * num_group, 1))  # (B, 2G, T)
    pts = jnp.tile(points[:, None, :, :], (1, 2 * num_group, 1, 1))

    # label noise: flip to a random class with prob ratio*0.5
    flip = jax.random.bernoulli(k1, label_noise_ratio * 0.5, lab.shape)
    rand_lab = jax.random.randint(k2, lab.shape, 0, num_classes)
    lab = jnp.where(flip, rand_lab, lab)

    # point noise: positives +- small, negatives +- larger (contrastive)
    noise = (jax.random.uniform(k3, pts.shape) * 2.0 - 1.0)
    group_ids = jnp.arange(2 * num_group) % 2  # 0 = positive, 1 = negative
    scale = jnp.where(group_ids == 0, 0.5, 1.0)[None, :, None, None]
    pts_noised = pts + noise * point_noise_scale * scale * 0.1
    pts_noised = jnp.clip(pts_noised, 0.0, 1.0)

    lab = lab.reshape(B, n_dn)
    pts_noised = pts_noised.reshape(B, n_dn, 2)

    dn_embed = class_embed[lab]  # (B, n_dn, C)
    eps = 1e-5
    dn_points_unact = jnp.log(
        jnp.clip(pts_noised, eps) / jnp.clip(1.0 - pts_noised, eps)
    )

    # Block-diagonal attention mask: matching queries cannot see denoising
    # groups; each group only sees itself.
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
