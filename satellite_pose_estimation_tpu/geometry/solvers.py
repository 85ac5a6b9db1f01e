"""End-to-end device-resident pose solvers.

These are the TPU-native equivalents of the reference's host-side solver
objects, with the per-image Python loops replaced by fixed-shape masked
tensor ops so the whole pipeline (query selection -> robust init -> refine ->
quaternion) runs inside one jit program and vmaps over the image batch:

* solve_pose_simple        ~ SimplePoseSolver (R1/utils/speed_eval.py:143-242)
* solve_pose_sigma         ~ SimplePoseSolverSigma + ceres_pnp
                             (R2/utils/speed_eval.py:322-420)
* solve_pose_self_assessed ~ EPnPCeresSolver with adaptive threshold and
                             refine-or-fallback self-assessment
                             (R2/utils/speed_eval_ceres.py:43-169)
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.precision import highest_precision

from .camera import Camera
from .epnp import epnp
from .projection import project_points
from .ransac import ransac_p3p
from .refine import gauss_newton_pnp, huber_weighted_pnp
from .rotations import inverse_rodrigues, rodrigues, rotmat_to_quat


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    num_keypoints: int = 11
    reproj_threshold: float = 20.0  # R1 --repro default
    sigma_reproj_threshold: float = 25.0  # R2 SimplePoseSolverSigma
    huber_delta: float = 0.005
    refine_iters: int = 15
    input_size: int = 256  # for the adaptive threshold of the EPnPCeres path


def select_keypoints(points, probs, sigmas=None, num_keypoints=11):
    """Per-label best-query selection (device-side).

    Mirrors the reference selection: label = argmax prob; background queries
    (label == num_keypoints) dropped; per label keep the query with the
    highest probability (R1/utils/speed_eval.py:184-200).

    Args:
        points: (Q, 2) predicted points (original-image pixels).
        probs:  (Q, num_keypoints + 1) softmax probabilities.
        sigmas: optional (Q, 2) per-point variances.
    Returns:
        kp (K, 2), mask (K,) bool, sig (K, 2) (ones when sigmas is None).
    """
    labels = jnp.argmax(probs, axis=-1)  # (Q,)
    scores = jnp.max(probs, axis=-1)
    fg = labels != probs.shape[-1] - 1

    # (K, Q) score table: score of query q for label k, -inf if not assigned.
    label_ids = jnp.arange(num_keypoints)
    assigned = (labels[None, :] == label_ids[:, None]) & fg[None, :]
    table = jnp.where(assigned, scores[None, :], -jnp.inf)
    best_q = jnp.argmax(table, axis=-1)  # (K,)
    mask = jnp.any(assigned, axis=-1)  # (K,)

    kp = points[best_q]
    sig = jnp.ones_like(kp) if sigmas is None else sigmas[best_q]
    return kp, mask, sig


def _finalize(R, t, valid):
    quat = rotmat_to_quat(R)
    quat = jnp.where(valid, quat, jnp.zeros_like(quat))
    tvec = jnp.where(valid, t, jnp.zeros_like(t))
    return quat, tvec


@partial(jax.jit, static_argnames=("config",))
@highest_precision
def solve_pose_simple(world, points, probs, config: SolverConfig = SolverConfig()):
    """R1 path: P3P-RANSAC init + iterative (pixel LM) refine on inliers.

    Failure contract matches SpeedEval (R1/datasets/speed.py:351-363): an
    unsolvable image yields the zero pose instead of raising.
    Returns (quat (4,), tvec (3,), valid ()).
    """
    K = Camera.K_jnp(world.dtype)
    kp, mask, _ = select_keypoints(points, probs, None, config.num_keypoints)

    ransac = ransac_p3p(
        world, kp, K, mask, config.reproj_threshold, max_points=config.num_keypoints
    )
    rvec0 = inverse_rodrigues(ransac["R"])
    rvec, tvec = gauss_newton_pnp(
        world, kp, K, rvec0, ransac["t"], ransac["inliers"],
        iters=config.refine_iters,
    )
    valid = ransac["valid"]
    quat, tvec = _finalize(rodrigues(rvec), tvec, valid)
    return quat, tvec, valid


@partial(jax.jit, static_argnames=("config",))
@highest_precision
def solve_pose_sigma(
    world, points, probs, sigmas, config: SolverConfig = SolverConfig()
):
    """R2 sigma path: robust init + sigma-weighted Huber LM refine.

    Reference: SimplePoseSolverSigma — EPnP-RANSAC init (threshold 25) then
    ceres_pnp with weights 1/sqrt(sigma) normalized per axis
    (R2/utils/speed_eval.py:389-409).

    Documented divergence: the init here is exhaustive-minimal P3P RANSAC
    (all C(11,3) samples evaluated on device) instead of cv2's sampled
    EPnP RANSAC. Measured equivalent on 120 synthetic poses with gross
    outliers — same refine, final SPEED scores statistically
    indistinguishable (tests/test_sigma_init_parity.py).
    """
    K = Camera.K_jnp(world.dtype)
    kp, mask, sig = select_keypoints(points, probs, sigmas, config.num_keypoints)

    ransac = ransac_p3p(
        world, kp, K, mask, config.sigma_reproj_threshold,
        max_points=config.num_keypoints,
    )
    rvec0 = inverse_rodrigues(ransac["R"])
    rvec, tvec = huber_weighted_pnp(
        world, kp, K, sig, rvec0, ransac["t"], ransac["inliers"],
        huber_delta=config.huber_delta,
    )
    valid = ransac["valid"]
    quat, tvec = _finalize(rodrigues(rvec), tvec, valid)
    return quat, tvec, valid


@partial(jax.jit, static_argnames=("config",))
@highest_precision
def solve_pose_self_assessed(
    world, points, probs, sigmas, bbox_area,
    config: SolverConfig = SolverConfig(),
):
    """R2 headline path (EPnPCeresSolver): EPnP on all selected points,
    adaptive reprojection threshold from detection-box area, sigma-weighted
    Huber refine on inliers, and self-assessment fallback — keep the EPnP
    init if refinement worsens total reprojection error
    (R2/utils/speed_eval_ceres.py:128-151).
    """
    K = Camera.K_jnp(world.dtype)
    kp, mask, sig = select_keypoints(points, probs, sigmas, config.num_keypoints)

    # Adaptive threshold: clamp(int(area / input_size * 10), 1.5, 20).
    th = jnp.floor(bbox_area / config.input_size * 10.0)
    th = jnp.clip(th, 1.5, 20.0)

    R0, t0 = epnp(world, kp, K, mask)
    proj0, _ = project_points(world, K, R0, t0)
    err0 = jnp.linalg.norm(proj0 - kp, axis=-1)
    inliers = (err0 < th) & mask
    rep_err_init = jnp.sum(jnp.where(mask, err0, 0.0))

    rvec0 = inverse_rodrigues(R0)
    rvec, tvec = huber_weighted_pnp(
        world, kp, K, sig, rvec0, t0, inliers, huber_delta=0.001
    )
    R1 = rodrigues(rvec)
    proj1, _ = project_points(world, K, R1, tvec)
    err1 = jnp.linalg.norm(proj1 - kp, axis=-1)
    rep_err_ref = jnp.sum(jnp.where(mask, err1, 0.0))

    use_refined = rep_err_ref <= rep_err_init
    R = jnp.where(use_refined, R1, R0)
    t = jnp.where(use_refined, tvec, t0)

    valid = jnp.sum(mask) >= 4
    quat, t = _finalize(R, t, valid)
    return quat, t, valid


# Batched variants -----------------------------------------------------------

def solve_pose_simple_batch(world, points, probs, config=SolverConfig()):
    """vmap over the leading batch axis of points/probs."""
    return jax.vmap(lambda p, l: solve_pose_simple(world, p, l, config))(
        points, probs
    )


def solve_pose_sigma_batch(world, points, probs, sigmas, config=SolverConfig()):
    return jax.vmap(lambda p, l, s: solve_pose_sigma(world, p, l, s, config))(
        points, probs, sigmas
    )


def solve_pose_self_assessed_batch(
    world, points, probs, sigmas, areas, config=SolverConfig()
):
    return jax.vmap(
        lambda p, l, s, a: solve_pose_self_assessed(world, p, l, s, a, config)
    )(points, probs, sigmas, areas)
