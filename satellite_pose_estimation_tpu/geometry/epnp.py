"""EPnP (Lepetit et al.) in pure JAX — masked, fixed-shape, vmap-friendly.

TPU-native replacement for cv2.solvePnPGeneric(..., SOLVEPNP_EPNP)
(R2/utils/speed_eval_ceres.py:153-169). Only fixed-size linear algebra is
used (12x12 eigh, 3x3 svd), so the whole solve lives inside jit and batches
with vmap — no host round-trip per image.

Implements the N=1 and N=2 beta cases with a least-squares scale fit and
positive-depth disambiguation; the result is a basin-accurate initialisation
that the Gauss-Newton refiner (refine.py) polishes to OpenCV-level accuracy.
"""
from __future__ import annotations

import jax.numpy as jnp

from .projection import normalize_points
from ..ops.precision import highest_precision

_PAIRS = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


def _kabsch(pw, pc, w):
    """Weighted rigid alignment: find R, t with pc ~= R @ pw + t."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    cw = jnp.sum(pw * w[:, None], axis=0) / wsum
    cc = jnp.sum(pc * w[:, None], axis=0) / wsum
    A = (pw - cw) * w[:, None]
    B = pc - cc
    H = A.T @ B  # 3x3
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], dtype=pw.dtype)).at[2, 2].set(d)
    R = Vt.T @ D @ U.T
    t = cc - R @ cw
    return R, t


def _control_points(world, w):
    """Centroid + PCA-scaled control points, masked."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    c0 = jnp.sum(world * w[:, None], axis=0) / wsum
    A = (world - c0) * w[:, None]
    cov = A.T @ (world - c0)  # 3x3 (weighted scatter)
    eigval, eigvec = jnp.linalg.eigh(cov)
    # Guard degenerate directions so the barycentric solve stays invertible.
    scale = jnp.sqrt(jnp.maximum(eigval / wsum, 1e-8))
    cs = c0[None, :] + (eigvec * scale[None, :]).T  # rows are c1..c3
    return jnp.concatenate([c0[None, :], cs], axis=0)  # (4, 3)


def _barycentric(world, ctrl):
    """alphas (N, 4) with world_i = sum_j alpha_ij * ctrl_j, sum_j alpha = 1."""
    basis = (ctrl[1:] - ctrl[0:1]).T  # 3x3, columns are c_j - c_0
    rhs = (world - ctrl[0][None, :]).T  # 3xN
    a123 = jnp.linalg.solve(basis, rhs).T  # (N, 3)
    a0 = 1.0 - jnp.sum(a123, axis=-1, keepdims=True)
    return jnp.concatenate([a0, a123], axis=-1)


def _scale_and_sign(ccs, ctrl, alphas, w):
    """Least-squares scale between camera/world control-point distances, then
    flip for positive mean depth."""
    num = 0.0
    den = 0.0
    for i, j in _PAIRS:
        dc = jnp.linalg.norm(ccs[i] - ccs[j])
        dw = jnp.linalg.norm(ctrl[i] - ctrl[j])
        num = num + dc * dw
        den = den + dc * dc
    beta = num / jnp.maximum(den, 1e-12)
    ccs = ccs * beta
    pc = alphas @ ccs
    depth = jnp.sum(pc[:, 2] * w)
    ccs = jnp.where(depth < 0, -ccs, ccs)
    return ccs


def _pose_from_ccs(ccs, world, alphas, w):
    pc = alphas @ ccs
    return _kabsch(world, pc, w)


def _reproj_err(world, obs_norm, R, t, w):
    pc = world @ R.T + t[None, :]
    z = jnp.where(jnp.abs(pc[:, 2:3]) < 1e-9, 1e-9, pc[:, 2:3])
    proj = pc[:, :2] / z
    err = jnp.linalg.norm(proj - obs_norm, axis=-1)
    return jnp.sum(err * w)


@highest_precision
def epnp(world, image_pix, K, mask=None):
    """Masked EPnP.

    Args:
        world: (N, 3) world points.
        image_pix: (N, 2) observed pixel coordinates.
        K: (3, 3) intrinsics.
        mask: optional (N,) bool/float validity mask (>=4 valid points).
    Returns:
        R (3,3), t (3,): world->camera pose minimising reprojection.
    """
    n = world.shape[0]
    w = jnp.ones((n,), world.dtype) if mask is None else mask.astype(world.dtype)
    obs = normalize_points(image_pix, K)

    ctrl = _control_points(world, w)
    alphas = _barycentric(world, ctrl)

    # M^T M accumulation; masked rows contribute zero.
    # Row pair for point i: [a_j, 0, -a_j x_i], [0, a_j, -a_j y_i] per ctrl j.
    a = alphas * w[:, None]  # premultiplied mask keeps M^T M masked
    x = obs[:, 0:1]
    y = obs[:, 1:2]
    zeros = jnp.zeros_like(a)
    # Build rows explicitly: (2N, 12), interleaved layout [ax, ay, az]*4
    row_x = jnp.stack([a, zeros, -a * x], axis=-1).reshape(n, 12)
    row_y = jnp.stack([zeros, a, -a * y], axis=-1).reshape(n, 12)
    M = jnp.concatenate([row_x, row_y], axis=0)  # (2N, 12)
    MtM = M.T @ M

    eigval, eigvec = jnp.linalg.eigh(MtM)  # ascending

    # Case N=1: smallest eigenvector.
    v1 = eigvec[:, 0].reshape(4, 3)
    ccs1 = _scale_and_sign(v1, ctrl, alphas, w)
    R1, t1 = _pose_from_ccs(ccs1, world, alphas, w)

    # Case N=2: two smallest eigenvectors; solve distance system for
    # [b11, b12, b22] then recover (b1, b2).
    v2 = eigvec[:, 1].reshape(4, 3)
    L = []
    rho = []
    for i, j in _PAIRS:
        dv1 = v1[i] - v1[j]
        dv2 = v2[i] - v2[j]
        L.append(
            jnp.stack(
                [jnp.dot(dv1, dv1), 2.0 * jnp.dot(dv1, dv2), jnp.dot(dv2, dv2)]
            )
        )
        dw = ctrl[i] - ctrl[j]
        rho.append(jnp.dot(dw, dw))
    L = jnp.stack(L)  # (6, 3)
    rho = jnp.stack(rho)  # (6,)
    sol = jnp.linalg.lstsq(L, rho)[0]
    b11, b12, b22 = sol[0], sol[1], sol[2]
    b1 = jnp.sqrt(jnp.maximum(jnp.abs(b11), 1e-12))
    b1 = jnp.where(b11 < 0, 0.0, b1)
    b2 = jnp.where(b11 < 0, 0.0, b12 / jnp.maximum(b1, 1e-12))
    ccs2_raw = b1 * v1 + b2 * v2
    ccs2 = _scale_and_sign(ccs2_raw, ctrl, alphas, w)
    R2, t2 = _pose_from_ccs(ccs2, world, alphas, w)

    e1 = _reproj_err(world, obs, R1, t1, w)
    e2 = _reproj_err(world, obs, R2, t2, w)
    use1 = e1 <= e2
    R = jnp.where(use1, R1, R2)
    t = jnp.where(use1, t1, t2)
    return R, t
