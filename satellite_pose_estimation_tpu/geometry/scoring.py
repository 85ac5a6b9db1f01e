"""SPEED pose score, device-resident and batched.

Contract (R1/utils/speed_eval.py:245-262):
    s_t = ||t_pr - t_gt|| / ||t_gt||
    s_q = 2 * arccos(min(|q_pr . q_gt|, 1))   after canonicalising q[0] >= 0
    total = s_t + s_q
"""
from __future__ import annotations

import jax.numpy as jnp


def speed_score(q_pr, t_pr, q_gt, t_gt):
    """Single-pose SPEED score. Returns (s_t, s_q)."""
    q_pr = jnp.where(q_pr[..., :1] < 0, -q_pr, q_pr)
    q_gt = jnp.where(q_gt[..., :1] < 0, -q_gt, q_gt)

    s_t = jnp.linalg.norm(t_pr - t_gt, axis=-1) / jnp.linalg.norm(t_gt, axis=-1)
    dot = jnp.abs(jnp.sum(q_pr * q_gt, axis=-1))
    s_q = 2.0 * jnp.arccos(jnp.minimum(dot, 1.0))
    return s_t, s_q


def speed_score_batch(q_pr, t_pr, q_gt, t_gt):
    """Batched scores; shapes (B,4)/(B,3). Returns dict of (B,) arrays."""
    s_t, s_q = speed_score(q_pr, t_pr, q_gt, t_gt)
    return {"score_tvec": s_t, "score_quat": s_q, "score": s_t + s_q}
