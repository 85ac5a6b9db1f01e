"""P3P-RANSAC vs EPnP-RANSAC initialization parity for the sigma path.

The reference initializes SimplePoseSolverSigma with
cv2.solvePnPRansac(..., SOLVEPNP_EPNP, reprojectionError=25)
(R2/utils/speed_eval.py:389-410); our device solver substitutes exhaustive
P3P RANSAC (geometry/solvers.py:solve_pose_sigma). This test quantifies the
divergence: on 120 synthetic poses with noise + gross outliers, both inits
are refined by the SAME sigma-weighted Huber LM, and the final SPEED scores
must be statistically equivalent (P3P no worse than EPnP + 0.005).
"""
import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from satellite_pose_estimation_tpu.geometry import (
    Camera,
    WORLD_POINTS,
    huber_weighted_pnp,
    inverse_rodrigues,
    ransac_p3p,
    rodrigues,
    rotmat_to_quat,
    speed_score,
)


def _make_case(rng, n_outliers=2, noise=1.0):
    rvec = rng.randn(3)
    rvec = rvec / np.linalg.norm(rvec) * rng.uniform(0, np.pi)
    tvec = np.array(
        [rng.uniform(-1, 1), rng.uniform(-1, 1), rng.uniform(4.0, 30.0)]
    )
    world = WORLD_POINTS.astype(np.float64)
    img, _ = cv2.projectPoints(world, rvec, tvec, Camera.K, np.zeros(5))
    kp = img.reshape(-1, 2) + rng.randn(11, 2) * noise
    sig = np.full((11, 2), noise)
    out_idx = rng.choice(11, n_outliers, replace=False)
    kp[out_idx] += rng.uniform(60, 150, (n_outliers, 2)) * np.sign(
        rng.randn(n_outliers, 2)
    )
    sig[out_idx, :] = 30.0
    return rvec, tvec, kp, sig


def _score(quat, t, rvec_gt, tvec_gt):
    R_gt, _ = cv2.Rodrigues(rvec_gt)
    q_gt = np.asarray(rotmat_to_quat(jnp.asarray(R_gt)))
    s_t, s_q = speed_score(
        jnp.asarray(quat), jnp.asarray(t),
        jnp.asarray(q_gt), jnp.asarray(tvec_gt),
    )
    return float(s_t) + float(s_q)


def test_p3p_init_matches_epnp_init_scores(rng):
    world = jnp.asarray(WORLD_POINTS, jnp.float64)
    K = jnp.asarray(Camera.K, jnp.float64)
    mask = jnp.ones(11, bool)
    scores_p3p, scores_epnp = [], []

    for i in range(120):
        rvec_gt, tvec_gt, kp_np, sig_np = _make_case(rng)
        kp = jnp.asarray(kp_np, jnp.float64)
        sig = jnp.asarray(sig_np, jnp.float64)

        # ours: exhaustive-minimal P3P RANSAC init (threshold 25)
        ransac = ransac_p3p(world, kp, K, mask, 25.0, max_points=11)
        rvec, tvec = huber_weighted_pnp(
            world, kp, K, sig, inverse_rodrigues(ransac["R"]), ransac["t"],
            ransac["inliers"], huber_delta=1.0,
        )
        quat = rotmat_to_quat(rodrigues(rvec))
        scores_p3p.append(_score(quat, np.asarray(tvec), rvec_gt, tvec_gt))

        # reference: cv2 EPnP RANSAC init (threshold 25), SAME refine
        ok, rv0, tv0, inl = cv2.solvePnPRansac(
            WORLD_POINTS.astype(np.float64), kp_np, Camera.K, np.zeros(5),
            flags=cv2.SOLVEPNP_EPNP, reprojectionError=25.0,
            iterationsCount=200,
        )
        assert ok
        inl_mask = np.zeros(11, bool)
        inl_mask[np.asarray(inl).ravel()] = True
        rvec_e, tvec_e = huber_weighted_pnp(
            world, kp, K, sig, jnp.asarray(rv0.ravel(), jnp.float64),
            jnp.asarray(tv0.ravel(), jnp.float64), jnp.asarray(inl_mask),
            huber_delta=1.0,
        )
        quat_e = rotmat_to_quat(rodrigues(rvec_e))
        scores_epnp.append(
            _score(quat_e, np.asarray(tvec_e), rvec_gt, tvec_gt)
        )

    p3p, epnp_ = np.asarray(scores_p3p), np.asarray(scores_epnp)
    # Both pipelines must solve the scene (scores near zero)...
    assert np.median(p3p) < 0.02 and np.median(epnp_) < 0.02
    # ...and P3P init must be no worse than EPnP init on aggregate.
    assert p3p.mean() <= epnp_.mean() + 0.005, (p3p.mean(), epnp_.mean())
    # Large per-case divergence should be rare (same basin of attraction).
    assert np.mean(np.abs(p3p - epnp_) > 0.05) < 0.05
