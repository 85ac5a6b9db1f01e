"""Pinhole projection helpers (pure JAX, batched).

Equivalent to the reference's project_pts / cv2.projectPoints usage with the
zero-distortion SPEED camera (R1/utils/utils.py:49-69).
"""
from __future__ import annotations

import jax.numpy as jnp

from .rotations import quat_to_rotmat, rodrigues
from ..ops.precision import highest_precision


@highest_precision
def project_points(pts, K, R, t):
    """Project world points through [R|t] and intrinsics K.

    Args:
        pts: (..., N, 3) world points.
        K: (3, 3) intrinsics.
        R: (..., 3, 3) rotation.
        t: (..., 3) translation.
    Returns:
        (..., N, 2) pixel coordinates, (..., N) camera-frame depth.
    """
    pc = jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]
    z = pc[..., 2]
    xy = pc[..., :2] / jnp.where(jnp.abs(z[..., None]) < 1e-12, 1e-12, z[..., None])
    u = K[0, 0] * xy[..., 0] + K[0, 2]
    v = K[1, 1] * xy[..., 1] + K[1, 2]
    return jnp.stack([u, v], axis=-1), z


def project_points_rvec(pts, K, rvec, tvec):
    return project_points(pts, K, rodrigues(rvec), tvec)


def project_points_quat(pts, K, quat, tvec):
    """Project with a scalar-first quaternion (standard R(q) convention)."""
    return project_points(pts, K, quat_to_rotmat(quat), tvec)


def normalize_points(pix, K):
    """Pixel -> normalized camera coordinates (cv2.undistortPoints with
    zero distortion)."""
    x = (pix[..., 0] - K[0, 2]) / K[0, 0]
    y = (pix[..., 1] - K[1, 2]) / K[1, 1]
    return jnp.stack([x, y], axis=-1)
