"""Rotation/quaternion parity vs cv2 + reference conventions."""
import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from satellite_pose_estimation_tpu.geometry import (
    quat_to_rotmat,
    rotmat_to_quat,
    quat_to_dcm,
    rodrigues,
    inverse_rodrigues,
)


def random_quats(rng, n):
    q = rng.randn(n, 4)
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def reference_quat2dcm(q):
    """numpy port of the SPEED quat2dcm formula (R1/utils/utils.py:101-128)."""
    q = q / np.linalg.norm(q)
    q0, q1, q2, q3 = q
    dcm = np.zeros((3, 3))
    dcm[0, 0] = 2 * q0**2 - 1 + 2 * q1**2
    dcm[1, 1] = 2 * q0**2 - 1 + 2 * q2**2
    dcm[2, 2] = 2 * q0**2 - 1 + 2 * q3**2
    dcm[0, 1] = 2 * q1 * q2 + 2 * q0 * q3
    dcm[0, 2] = 2 * q1 * q3 - 2 * q0 * q2
    dcm[1, 0] = 2 * q1 * q2 - 2 * q0 * q3
    dcm[1, 2] = 2 * q2 * q3 + 2 * q0 * q1
    dcm[2, 0] = 2 * q1 * q3 + 2 * q0 * q2
    dcm[2, 1] = 2 * q2 * q3 - 2 * q0 * q1
    return dcm


def test_quat_to_dcm_matches_reference_formula(rng):
    for q in random_quats(rng, 20):
        ours = np.asarray(quat_to_dcm(jnp.asarray(q, jnp.float64)))
        ref = reference_quat2dcm(q)
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_quat_rotmat_roundtrip(rng):
    q = random_quats(rng, 50)
    R = quat_to_rotmat(jnp.asarray(q))
    q2 = np.asarray(rotmat_to_quat(R))
    # Same rotation up to sign.
    dots = np.abs(np.sum(q * q2, axis=1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)


def test_rodrigues_matches_cv2(rng):
    for _ in range(20):
        rvec = rng.randn(3) * 2.0
        R_cv, _ = cv2.Rodrigues(rvec)
        R_ours = np.asarray(rodrigues(jnp.asarray(rvec, jnp.float64)))
        np.testing.assert_allclose(R_ours, R_cv, atol=1e-6)


def test_inverse_rodrigues_roundtrip(rng):
    for scale in (1e-8, 0.1, 1.0, 3.0):
        rvec = rng.randn(3)
        rvec = rvec / np.linalg.norm(rvec) * scale
        R = rodrigues(jnp.asarray(rvec, jnp.float64))
        back = np.asarray(inverse_rodrigues(R))
        R2 = np.asarray(rodrigues(jnp.asarray(back)))
        np.testing.assert_allclose(np.asarray(R), R2, atol=1e-6)


def test_rotmat_to_quat_matches_cv2_convention(rng):
    """cv2.Rodrigues rotation matrix -> our quat -> back to matrix."""
    for _ in range(20):
        rvec = rng.randn(3)
        R_cv, _ = cv2.Rodrigues(rvec)
        q = rotmat_to_quat(jnp.asarray(R_cv, jnp.float64))
        R_back = np.asarray(quat_to_rotmat(q))
        np.testing.assert_allclose(R_back, R_cv, atol=1e-6)
