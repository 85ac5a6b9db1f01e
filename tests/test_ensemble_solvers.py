"""Multi-mean ensemble solver + exhaustive minimal EPnP solver tests."""
import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from satellite_pose_estimation_tpu.geometry import (
    Camera,
    WORLD_POINTS,
    exhaustive_pnp,
    solve_pose_multi_mean,
    speed_score,
)
from satellite_pose_estimation_tpu.geometry.rotations import rotmat_to_quat


def gt_pose(rng):
    rvec = rng.randn(3) * 0.7
    tvec = np.array([0.2, -0.1, rng.uniform(10, 25)])
    img, _ = cv2.projectPoints(WORLD_POINTS, rvec, tvec, Camera.K, np.zeros(5))
    R, _ = cv2.Rodrigues(rvec)
    q = np.asarray(rotmat_to_quat(jnp.asarray(R)))
    return img.reshape(-1, 2), q, tvec


def model_predictions(img_pts, rng, n_queries=20, noise=1.0):
    """Simulate one model's query output: 11 fg queries near GT + bg."""
    points = rng.rand(n_queries, 2).astype(np.float32) * 100
    probs = np.zeros((n_queries, 12), np.float32)
    probs[:, 11] = 0.9  # background
    order = rng.permutation(n_queries)[:11]
    for label, qi in enumerate(order):
        points[qi] = img_pts[label] + rng.randn(2) * noise
        probs[qi] = 0.01
        probs[qi, label] = 0.8
    return points, probs


def test_multi_mean_recovers_pose(rng):
    img_pts, q_gt, t_gt = gt_pose(rng)
    M = 3
    pts = []
    prb = []
    for _ in range(M):
        p, pr = model_predictions(img_pts, rng)
        pts.append(p)
        prb.append(pr)
    # corrupt one model's point 0 grossly: 3-sigma filter should reject it
    pts[0][np.argmax(prb[0][:, 0])] += 500.0

    quat, tvec, valid = solve_pose_multi_mean(
        jnp.asarray(WORLD_POINTS, jnp.float32),
        jnp.asarray(np.stack(pts)),
        jnp.asarray(np.stack(prb)),
    )
    assert bool(valid)
    s_t, s_q = speed_score(
        quat, tvec, jnp.asarray(q_gt, jnp.float32), jnp.asarray(t_gt, jnp.float32)
    )
    assert float(s_t) + float(s_q) < 0.15, (float(s_t), float(s_q))


def test_exhaustive_pnp_recovers_pose(rng):
    img_pts, q_gt, t_gt = gt_pose(rng)
    kp = img_pts + rng.randn(11, 2) * 0.5
    quat, tvec, valid = exhaustive_pnp(
        jnp.asarray(WORLD_POINTS, jnp.float32),
        jnp.asarray(kp, jnp.float32),
        jnp.ones(11),
    )
    assert bool(valid)
    s_t, s_q = speed_score(
        quat, tvec, jnp.asarray(q_gt, jnp.float32), jnp.asarray(t_gt, jnp.float32)
    )
    assert float(s_t) + float(s_q) < 0.1, (float(s_t), float(s_q))


def test_exhaustive_pnp_masked_degenerate(rng):
    kp = rng.rand(11, 2).astype(np.float32) * 100
    quat, tvec, valid = exhaustive_pnp(
        jnp.asarray(WORLD_POINTS, jnp.float32),
        jnp.asarray(kp),
        jnp.zeros(11),  # no valid points
    )
    assert not bool(valid)
    assert np.allclose(np.asarray(quat), 0) and np.allclose(np.asarray(tvec), 0)
