"""Rotation parameterisations: quaternions, rotation matrices, axis-angle.

All functions are pure JAX, fully batched-friendly (vmap/jit), and use the
scalar-first (w, x, y, z) quaternion convention of the SPEED dataset.

Conventions (matching the reference):
* ``quat_to_rotmat(q)`` is the standard rotation matrix R(q) acting on column
  vectors; ``rotmat_to_quat`` is its inverse (mathutils Matrix.to_quaternion
  equivalent, R1/utils/speed_eval.py:131).
* ``quat_to_dcm(q)`` is the SPEED "direction cosine matrix" = R(q)^T
  (R1/utils/utils.py:101-128 quat2dcm) used when interpreting ground-truth
  q_vbs2tango labels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from ..ops.precision import highest_precision


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


@highest_precision
def quat_to_rotmat(q):
    """Quaternion (w,x,y,z) -> 3x3 rotation matrix (column-vector convention)."""
    q = quat_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


@highest_precision
def rotmat_to_quat(R):
    """3x3 rotation matrix -> quaternion (w,x,y,z), Shepperd's method.

    Branch-free (all four cases computed, best selected by trace terms), so it
    is jit/vmap-safe. The returned quaternion has an arbitrary global sign;
    SPEED scoring canonicalises via ``q[0] >= 0``.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22

    # Four candidate 4*q_i^2 values.
    tw = 1.0 + tr
    tx = 1.0 + m00 - m11 - m22
    ty = 1.0 - m00 + m11 - m22
    tz = 1.0 - m00 - m11 + m22

    # Case w: pivot on w
    sw = jnp.sqrt(jnp.maximum(tw, 1e-12)) * 2.0  # 4w
    qw_w = 0.25 * sw
    qx_w = (m21 - m12) / sw
    qy_w = (m02 - m20) / sw
    qz_w = (m10 - m01) / sw

    sx = jnp.sqrt(jnp.maximum(tx, 1e-12)) * 2.0  # 4x
    qw_x = (m21 - m12) / sx
    qx_x = 0.25 * sx
    qy_x = (m01 + m10) / sx
    qz_x = (m02 + m20) / sx

    sy = jnp.sqrt(jnp.maximum(ty, 1e-12)) * 2.0  # 4y
    qw_y = (m02 - m20) / sy
    qx_y = (m01 + m10) / sy
    qy_y = 0.25 * sy
    qz_y = (m12 + m21) / sy

    sz = jnp.sqrt(jnp.maximum(tz, 1e-12)) * 2.0  # 4z
    qw_z = (m10 - m01) / sz
    qx_z = (m02 + m20) / sz
    qy_z = (m12 + m21) / sz
    qz_z = 0.25 * sz

    cand = jnp.stack(
        [
            jnp.stack([qw_w, qx_w, qy_w, qz_w], axis=-1),
            jnp.stack([qw_x, qx_x, qy_x, qz_x], axis=-1),
            jnp.stack([qw_y, qx_y, qy_y, qz_y], axis=-1),
            jnp.stack([qw_z, qx_z, qy_z, qz_z], axis=-1),
        ],
        axis=-2,
    )  # (..., 4 cases, 4)
    t_all = jnp.stack([tw, tx, ty, tz], axis=-1)
    best = jnp.argmax(t_all, axis=-1)
    q = jnp.take_along_axis(cand, best[..., None, None].repeat(4, axis=-1), axis=-2)
    q = jnp.squeeze(q, axis=-2)
    return quat_normalize(q)


def quat_to_dcm(q):
    """SPEED quat2dcm: returns R(q)^T (inertial->body direction cosine matrix)."""
    return jnp.swapaxes(quat_to_rotmat(q), -1, -2)


def dcm_to_quat(dcm):
    return rotmat_to_quat(jnp.swapaxes(dcm, -1, -2))


@highest_precision
def rodrigues(rvec):
    """Axis-angle (3,) -> rotation matrix (3,3) via Rodrigues' formula.

    Taylor-safe near theta=0 so it is differentiable everywhere.
    """
    theta2 = jnp.sum(rvec * rvec, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    small = theta2 < 1e-12

    # sin(t)/t and (1-cos(t))/t^2 with series fallbacks
    sin_t = jnp.sin(theta)
    cos_t = jnp.cos(theta)
    a = jnp.where(small, 1.0 - theta2 / 6.0, sin_t / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - cos_t) / jnp.maximum(theta2, 1e-24))

    x, y, z = rvec[..., 0], rvec[..., 1], rvec[..., 2]
    zeros = jnp.zeros_like(x)
    K = jnp.stack(
        [
            jnp.stack([zeros, -z, y], axis=-1),
            jnp.stack([z, zeros, -x], axis=-1),
            jnp.stack([-y, x, zeros], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    K2 = K @ K
    return eye + a[..., None, None] * K + b[..., None, None] * K2


@highest_precision
def inverse_rodrigues(R):
    """Rotation matrix -> axis-angle (3,). Uses the quaternion route for
    numerical robustness near theta = 0 and pi."""
    q = rotmat_to_quat(R)
    # Canonical sign (w >= 0) keeps theta in [0, pi].
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    v = q[..., 1:]
    vnorm = jnp.linalg.norm(v, axis=-1)
    theta = 2.0 * jnp.arctan2(vnorm, w)
    scale = jnp.where(vnorm < 1e-9, 2.0, theta / jnp.maximum(vnorm, 1e-24))
    return v * scale[..., None]


def quat_multiply(q1, q2):
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )
