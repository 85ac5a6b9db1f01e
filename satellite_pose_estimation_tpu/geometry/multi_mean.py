"""Checkpoint-ensemble pose solving (Multi_Mean_PoseSolver equivalent).

Contract (R1/utils/speed_eval.py:42-140): pool every foreground prediction
from M models per keypoint label, average them, reject gross outliers
farther than 3x the std of distances-to-mean (only when >= 3 points), then
run the robust PnP (P3P-RANSAC + iterative refine) on the per-label means.

TPU-native: fixed shapes (M*Q candidate slots per label, masked), one jit
program, vmappable over the image batch.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.precision import highest_precision
from .camera import Camera
from .ransac import ransac_p3p
from .refine import gauss_newton_pnp
from .rotations import inverse_rodrigues, rodrigues


@partial(jax.jit, static_argnames=("config",))
@highest_precision
def solve_pose_multi_mean(world, points, probs, config=None):
    """
    Args:
        world: (K, 3) world points.
        points: (M, Q, 2) per-model query points (original-image pixels).
        probs: (M, Q, K+1) per-model softmax probabilities.
    Returns:
        (quat (4,), tvec (3,), valid ()).
    """
    from .solvers import SolverConfig, _finalize

    cfg = config or SolverConfig()
    K = cfg.num_keypoints
    M, Q, _ = points.shape

    flat_pts = points.reshape(M * Q, 2)
    flat_probs = probs.reshape(M * Q, -1)
    labels = jnp.argmax(flat_probs, axis=-1)
    fg = labels != flat_probs.shape[-1] - 1

    label_ids = jnp.arange(K)
    assigned = (labels[None, :] == label_ids[:, None]) & fg[None, :]  # (K, MQ)
    counts = jnp.sum(assigned, axis=-1)  # (K,)
    w = assigned.astype(world.dtype)

    denom = jnp.maximum(counts.astype(world.dtype), 1.0)[:, None]
    mean0 = (w @ flat_pts) / denom  # (K, 2)

    # 3-sigma filter on distance-to-mean, only applied when count >= 3.
    d = jnp.linalg.norm(
        flat_pts[None, :, :] - mean0[:, None, :], axis=-1
    )  # (K, MQ)
    d_mean = jnp.sum(d * w, axis=-1) / denom[:, 0]
    d_var = jnp.sum(w * (d - d_mean[:, None]) ** 2, axis=-1) / denom[:, 0]
    d_std = jnp.sqrt(jnp.maximum(d_var, 0.0))
    keep = assigned & (d < (3.0 * d_std)[:, None])
    apply_filter = (counts >= 3)[:, None]
    keep = jnp.where(apply_filter, keep, assigned)
    # Guard: if the filter removed everything, fall back to the plain mean.
    keep_counts = jnp.sum(keep, axis=-1)
    keep = jnp.where((keep_counts == 0)[:, None], assigned, keep)

    wk = keep.astype(world.dtype)
    denom_k = jnp.maximum(jnp.sum(wk, axis=-1), 1.0)[:, None]
    kp = (wk @ flat_pts) / denom_k  # (K, 2)
    mask = counts > 0

    Kmat = Camera.K_jnp(world.dtype)
    ransac = ransac_p3p(world, kp, Kmat, mask, cfg.reproj_threshold,
                        max_points=K)
    rvec, tvec = gauss_newton_pnp(
        world, kp, Kmat, inverse_rodrigues(ransac["R"]), ransac["t"],
        ransac["inliers"], iters=cfg.refine_iters,
    )
    quat, tvec = _finalize(rodrigues(rvec), tvec, ransac["valid"])
    return quat, tvec, ransac["valid"]


def solve_pose_multi_mean_batch(world, points, probs, config=None):
    """vmap over a leading image-batch axis: points (B, M, Q, 2)."""
    return jax.vmap(
        lambda p, l: solve_pose_multi_mean(world, p, l, config)
    )(points, probs)
