"""Gauss-Newton / Levenberg-Marquardt PnP refinement — the device-resident
equivalent of the reference's two native refiners:

* cv2.solvePnPGeneric(..., SOLVEPNP_ITERATIVE) pixel-space LM refine
  (R1/utils/speed_eval.py:220-228)  -> gauss_newton_pnp(..., weights=None)
* PyCeres CreatePnPCostFunction + HuberLoss sigma-weighted LM on normalized
  coordinates (R2/utils/speed_eval.py:269-319) -> huber_weighted_pnp.

Fixed iteration counts, analytic Jacobians, 6x6 normal equations — one jit
program, vmappable over the batch.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.precision import highest_precision

from .rotations import rodrigues, inverse_rodrigues
from .projection import normalize_points


def _residual_and_jacobian(world, obs, K_diag, R, t, mask):
    """Stacked residuals (N,2) and per-point Jacobians (N,2,6).

    Parameterisation: left-multiplicative rotation increment delta_omega and
    additive translation delta_t, i.e. R' = exp(dw) R, t' = t + dt.
    K_diag = (fx, fy) or (1, 1) for normalized coordinates; obs already in
    the matching frame (pixels minus principal point handled by caller).
    """
    fx, fy = K_diag
    pc = world @ R.T + t[None, :]
    z = pc[:, 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = fx * pc[:, 0] / z_safe
    v = fy * pc[:, 1] / z_safe
    res = jnp.stack([u, v], axis=-1) - obs  # (N, 2)

    # d(u,v)/d(pc)
    inv_z = 1.0 / z_safe
    zeros = jnp.zeros_like(inv_z)
    J_proj = jnp.stack(
        [
            jnp.stack([fx * inv_z, zeros, -fx * pc[:, 0] * inv_z * inv_z], -1),
            jnp.stack([zeros, fy * inv_z, -fy * pc[:, 1] * inv_z * inv_z], -1),
        ],
        axis=-2,
    )  # (N, 2, 3)

    # d(pc)/d(dw) = -[pc - t]_x = -[R p]_x ; d(pc)/d(dt) = I
    rp = pc - t[None, :]
    rx, ry, rz = rp[:, 0], rp[:, 1], rp[:, 2]
    z0 = jnp.zeros_like(rx)
    skew = jnp.stack(
        [
            jnp.stack([z0, rz, -ry], -1),
            jnp.stack([-rz, z0, rx], -1),
            jnp.stack([ry, -rx, z0], -1),
        ],
        axis=-2,
    )  # (N, 3, 3) == -[rp]_x
    J_rot = J_proj @ skew  # (N, 2, 3)
    J_t = J_proj  # (N, 2, 3)
    J = jnp.concatenate([J_rot, J_t], axis=-1)  # (N, 2, 6)

    m = mask[:, None]
    return res * m, J * m[..., None]


def _chol_solve6(A, b):
    """Unrolled Cholesky solve for the damped SPD 6x6 normal equations.

    jnp.linalg.solve lowers to a generic batched LU on TPU whose pivoting
    serializes poorly under vmap; this fully-unrolled Cholesky is pure
    elementwise arithmetic, so under vmap every op vectorizes over the
    image batch (measured ~9x faster than the LU chain at the LM loop's
    20-solve depth, tools_dev/pnp_ab.py). A is SPD by construction
    (J^T J + positive damping), so no pivoting is needed.
    """
    n = 6
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
        inv = 1.0 / L[j][j]
        for i in range(j + 1, n):
            s = A[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)


def _solve_step(res, J, lm_lambda):
    """Damped normal-equation step: (J^T J + lambda diag) dx = -J^T r."""
    Jf = J.reshape(-1, 6)
    rf = res.reshape(-1)
    JtJ = Jf.T @ Jf
    Jtr = Jf.T @ rf
    damp = lm_lambda * jnp.diag(jnp.diagonal(JtJ)) + 1e-9 * jnp.eye(6, dtype=J.dtype)
    dx = _chol_solve6(JtJ + damp, -Jtr)
    return dx


def _huber_block_weights(res, delta):
    """Ceres-style Huber IRLS weight per residual block (2-vector per point):
    sqrt(rho'(s)) with s = ||r||^2."""
    s = jnp.sum(res * res, axis=-1)  # (N,)
    w2 = jnp.where(s <= delta * delta, 1.0, delta / jnp.sqrt(jnp.maximum(s, 1e-24)))
    return jnp.sqrt(w2)[:, None]


@partial(jax.jit, static_argnames=("iters",))
@highest_precision
def gauss_newton_pnp(world, image_pix, K, rvec0, tvec0, mask, iters=15):
    """Pixel-space LM refinement from an initial pose (SOLVEPNP_ITERATIVE
    equivalent). Masked; returns (rvec, tvec)."""
    fx, fy = K[0, 0], K[1, 1]
    obs = jnp.stack(
        [image_pix[:, 0] - K[0, 2], image_pix[:, 1] - K[1, 2]], axis=-1
    )
    m = mask.astype(world.dtype)

    def body(_, carry):
        R, t, lam = carry
        res, J = _residual_and_jacobian(world, obs, (fx, fy), R, t, m)
        cost0 = jnp.sum(res * res)
        dx = _solve_step(res, J, lam)
        R_new = rodrigues(dx[:3]) @ R
        t_new = t + dx[3:]
        res_new, _ = _residual_and_jacobian(world, obs, (fx, fy), R_new, t_new, m)
        cost1 = jnp.sum(res_new * res_new)
        improved = cost1 < cost0
        R = jnp.where(improved, R_new, R)
        t = jnp.where(improved, t_new, t)
        lam = jnp.where(improved, lam * 0.5, lam * 4.0)
        lam = jnp.clip(lam, 1e-9, 1e6)
        return R, t, lam

    R0 = rodrigues(rvec0)
    R, t, _ = jax.lax.fori_loop(
        0, iters, body, (R0, tvec0, jnp.asarray(1e-3, world.dtype))
    )
    return inverse_rodrigues(R), t


@partial(jax.jit, static_argnames=("iters",))
@highest_precision
def huber_weighted_pnp(
    world,
    image_pix,
    K,
    sigmas,
    rvec0,
    tvec0,
    mask,
    huber_delta=0.005,
    iters=20,
):
    """Sigma-weighted Huber LM on normalized camera coordinates — the Ceres
    ceres_pnp equivalent (R2/utils/speed_eval.py:269-319).

    Weight contract (matching the reference exactly): per point/axis
        w = (1/(sqrt(sigma)+1e-6)) / sum_over_points(1/(sqrt(sigma)+1e-6))
    residual r = w * (project_normalized(R p + t) - undistort(obs)),
    robustified by Huber(delta) on the per-point residual block.
    Masked entries contribute nothing. Returns (rvec, tvec).
    """
    obs_norm = normalize_points(image_pix, K)
    m = mask.astype(world.dtype)

    sig = jnp.sqrt(jnp.maximum(sigmas, 0.0))
    w1 = 1.0 / (sig + 1e-6) * m[:, None]
    wsum = jnp.maximum(jnp.sum(w1, axis=0, keepdims=True), 1e-12)
    w = w1 / wsum  # (N, 2)

    ones2 = (jnp.asarray(1.0, world.dtype), jnp.asarray(1.0, world.dtype))

    def body(_, carry):
        R, t, lam = carry
        res, J = _residual_and_jacobian(world, obs_norm, ones2, R, t, m)
        res = res * w
        J = J * w[..., None]
        hw = _huber_block_weights(res, huber_delta)
        res_h = res * hw
        J_h = J * hw[..., None]
        cost0 = jnp.sum(res_h * res_h)
        dx = _solve_step(res_h, J_h, lam)
        R_new = rodrigues(dx[:3]) @ R
        t_new = t + dx[3:]
        res_new, _ = _residual_and_jacobian(world, obs_norm, ones2, R_new, t_new, m)
        res_new = res_new * w
        hw_new = _huber_block_weights(res_new, huber_delta)
        cost1 = jnp.sum((res_new * hw_new) ** 2)
        improved = cost1 < cost0
        R = jnp.where(improved, R_new, R)
        t = jnp.where(improved, t_new, t)
        lam = jnp.where(improved, lam * 0.5, lam * 4.0)
        lam = jnp.clip(lam, 1e-9, 1e6)
        return R, t, lam

    R0 = rodrigues(rvec0)
    R, t, _ = jax.lax.fori_loop(
        0, iters, body, (R0, tvec0, jnp.asarray(1e-3, world.dtype))
    )
    return inverse_rodrigues(R), t
