"""Closed-form P3P (Grunert formulation) in pure JAX.

TPU-native replacement for cv2.SOLVEPNP_P3P minimal solves inside RANSAC
(R1/utils/speed_eval.py:209-214). Everything is branch-free arithmetic —
quartic roots come from a fixed-iteration Durand-Kerner solve in complex
arithmetic plus Newton polishing, so no unsupported nonsymmetric eigen
decomposition is needed on TPU and the whole solver vmaps over (batch,
minimal-sample) axes.

Derivation used here (law-of-cosines form, s2 = u*s1, s3 = v*s1):
    s1^2 (u^2 + v^2 - 2 u v cos_a) = a^2      a = |P2-P3|, cos_a = f2.f3
    s1^2 (1 + v^2 - 2 v cos_b)     = b^2      b = |P1-P3|, cos_b = f1.f3
    s1^2 (1 + u^2 - 2 u cos_c)     = c^2      c = |P1-P2|, cos_c = f1.f2
Eliminating s1 and u yields a quartic in v (see _quartic_coeffs).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.precision import highest_precision


def _poly_mul(p, q):
    """Multiply polynomial coefficient lists (lowest degree first)."""
    res = [jnp.zeros(()) for _ in range(len(p) + len(q) - 1)]
    for i, pi in enumerate(p):
        for j, qj in enumerate(q):
            res[i + j] = res[i + j] + pi * qj
    return res


def _quartic_coeffs(a2, b2, c2, cos_a, cos_b, cos_c):
    """Quartic in v (lowest-degree-first, length 5).

    Q(v) = v^2 + k*(v^2 - 2 v cos_b + 1) - 1,  k = (c^2 - a^2)/b^2
    D(v) = 2 (v cos_a - cos_c)
    m(v) = (c^2/b^2) (v^2 - 2 v cos_b + 1)
    quartic: Q^2 - 2 cos_c * Q * D + (1 - m) * D^2 = 0
    """
    k = (c2 - a2) / b2
    kc = c2 / b2
    # Q: [C, B, A] lowest first
    Q = [k - 1.0, -2.0 * cos_b * k, 1.0 + k]
    D = [-2.0 * cos_c, 2.0 * cos_a]
    one_minus_m = [1.0 - kc, 2.0 * cos_b * kc, -kc]

    t1 = _poly_mul(Q, Q)  # degree 4
    t2 = _poly_mul(Q, D)  # degree 3
    t3 = _poly_mul(one_minus_m, _poly_mul(D, D))  # degree 4

    coeffs = []
    for deg in range(5):
        c_val = t1[deg] + t3[deg]
        if deg < len(t2):
            c_val = c_val - 2.0 * cos_c * t2[deg]
        coeffs.append(c_val)
    return jnp.stack(coeffs)  # (5,) lowest first


def _quartic_roots(coeffs, iters=40):
    """Durand-Kerner roots of a quartic; coeffs lowest-degree first, (..., 5).

    Returns complex roots (..., 4).
    """
    lead = coeffs[..., 4]
    lead = jnp.where(jnp.abs(lead) < 1e-12, 1e-12, lead)
    c = coeffs / lead[..., None]  # monic, lowest first: c0..c3, 1

    def poly(z):
        # Horner, monic quartic
        return (((z + c[..., 3, None]) * z + c[..., 2, None]) * z
                + c[..., 1, None]) * z + c[..., 0, None]

    base = jnp.asarray(0.4 + 0.9j, dtype=jnp.complex64)
    roots = base ** jnp.arange(1, 5)  # standard DK init
    roots = jnp.broadcast_to(roots, coeffs.shape[:-1] + (4,)).astype(jnp.complex64)

    for _ in range(iters):
        new_roots = []
        for i in range(4):
            zi = roots[..., i]
            denom = jnp.asarray(1.0 + 0.0j, dtype=jnp.complex64)
            for j in range(4):
                if j != i:
                    denom = denom * (zi - roots[..., j])
            denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
            new_roots.append(zi - poly(zi[..., None])[..., 0] / denom)
        roots = jnp.stack(new_roots, axis=-1)
    return roots


def _quartic_roots_ferrari(coeffs):
    """Closed-form quartic roots (Ferrari + complex Cardano resolvent).

    coeffs lowest-degree first, shape (..., 5); returns complex roots
    (..., 4). Replaces the 40-iteration Durand-Kerner chain: the whole
    solve is ~30 branch-free complex ops, so under vmap over (batch x 165
    triples) nothing serializes — measured ~5x faster on the exhaustive
    P3P RANSAC stage (tools_dev/pnp_ab.py). Degenerate cases (leading
    coefficient ~0, biquadratic q~0, double resolvent root) are handled
    with arithmetic guards; the callers' Newton polish + residual check
    (p3p_solutions) filter any remaining artifacts exactly as they did
    for Durand-Kerner.

    Complex precision follows the input dtype: f64 coeffs (CPU oracle
    tests under x64) solve in complex128, f32 (the TPU production path)
    in complex64 — matching what Durand-Kerner's dtype promotion did.
    """
    ctype = (jnp.complex128 if coeffs.dtype == jnp.float64
             else jnp.complex64)
    lead = coeffs[..., 4]
    lead = jnp.where(jnp.abs(lead) < 1e-12, 1e-12, lead)
    a = (coeffs[..., 3] / lead).astype(ctype)
    b = (coeffs[..., 2] / lead).astype(ctype)
    c = (coeffs[..., 1] / lead).astype(ctype)
    d = (coeffs[..., 0] / lead).astype(ctype)

    # Depressed quartic y^4 + p y^2 + q y + r, v = y - a/4.
    a2 = a * a
    p = b - 3.0 * a2 / 8.0
    q = c - a * b / 2.0 + a2 * a / 8.0
    r = d - a * c / 4.0 + a2 * b / 16.0 - 3.0 * a2 * a2 / 256.0

    # Resolvent cubic m^3 + p m^2 + (p^2/4 - r) m - q^2/8 = 0 (Cardano).
    A, B, C = p, p * p / 4.0 - r, -q * q / 8.0
    P = B - A * A / 3.0
    Q = 2.0 * A * A * A / 27.0 - A * B / 3.0 + C
    disc = jnp.sqrt(Q * Q / 4.0 + P * P * P / 27.0)
    # Pick the larger-magnitude branch for S to avoid cancellation.
    s1 = -Q / 2.0 + disc
    s2 = -Q / 2.0 - disc
    Sc = jnp.where(jnp.abs(s1) >= jnp.abs(s2), s1, s2)
    S = Sc ** (1.0 / 3.0)
    S_safe = jnp.where(jnp.abs(S) < 1e-12, 1e-12, S)
    T = jnp.where(jnp.abs(S) < 1e-12, 0.0, -P / (3.0 * S_safe))
    m = S + T - A / 3.0

    s = jnp.sqrt(2.0 * m)
    biquad = jnp.abs(s) < 1e-6
    s_safe = jnp.where(biquad, 1.0, s)
    qo2s = jnp.where(biquad, 0.0, q / (2.0 * s_safe))

    # Factored quadratics: y^2 -+ s y + (p/2 + m +- q/(2s)).
    c1q = p / 2.0 + m + qo2s
    c2q = p / 2.0 + m - qo2s
    d1 = jnp.sqrt(s * s - 4.0 * c1q)
    d2 = jnp.sqrt(s * s - 4.0 * c2q)
    y = jnp.stack(
        [(s + d1) / 2.0, (s - d1) / 2.0,
         (-s + d2) / 2.0, (-s - d2) / 2.0], axis=-1)

    # Biquadratic fallback (q ~ 0): y^2 = (-p +- sqrt(p^2 - 4 r)) / 2.
    db = jnp.sqrt(p * p - 4.0 * r)
    yb1 = jnp.sqrt((-p + db) / 2.0)
    yb2 = jnp.sqrt((-p - db) / 2.0)
    yb = jnp.stack([yb1, -yb1, yb2, -yb2], axis=-1)
    y = jnp.where(biquad[..., None], yb, y)

    return y - (a / 4.0)[..., None]


def _newton_polish_real(coeffs, v, iters=3):
    """Polish real roots with Newton steps on the quartic (lowest first)."""
    c0, c1, c2, c3, c4 = (coeffs[..., i] for i in range(5))
    for _ in range(iters):
        f = (((c4 * v + c3) * v + c2) * v + c1) * v + c0
        fp = ((4.0 * c4 * v + 3.0 * c3) * v + 2.0 * c2) * v + c1
        fp = jnp.where(jnp.abs(fp) < 1e-12, 1e-12, fp)
        v = v - f / fp
    return v


@highest_precision
def p3p_solutions(world3, image_pix3, K):
    """All P3P pose candidates for one 3-point correspondence set.

    Args:
        world3: (3, 3) world points.
        image_pix3: (3, 2) pixel observations.
        K: (3, 3) intrinsics.
    Returns:
        Rs (4, 3, 3), ts (4, 3), valid (4,) — up to four pose solutions
        (invalid slots are flagged and filled with identity poses).
    """
    dtype = world3.dtype
    # Unit bearing vectors.
    x = (image_pix3[:, 0] - K[0, 2]) / K[0, 0]
    y = (image_pix3[:, 1] - K[1, 2]) / K[1, 1]
    f = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)  # (3, 3)

    P1, P2, P3 = world3[0], world3[1], world3[2]
    a2 = jnp.sum((P2 - P3) ** 2)
    b2 = jnp.sum((P1 - P3) ** 2)
    c2 = jnp.sum((P1 - P2) ** 2)
    cos_a = jnp.dot(f[1], f[2])
    cos_b = jnp.dot(f[0], f[2])
    cos_c = jnp.dot(f[0], f[1])

    b2_safe = jnp.where(b2 < 1e-12, 1e-12, b2)
    coeffs = _quartic_coeffs(a2, b2_safe, c2, cos_a, cos_b, cos_c)

    roots = _quartic_roots_ferrari(coeffs)
    v = jnp.real(roots)
    real_ok = jnp.abs(jnp.imag(roots)) < 1e-3
    v = _newton_polish_real(coeffs[None, :].repeat(4, axis=0).reshape(4, 5), v)

    # Residual check after polish (rejects non-real DK artifacts).
    c0, c1, c2q, c3, c4 = (coeffs[i] for i in range(5))
    fval = (((c4 * v + c3) * v + c2q) * v + c1) * v + c0
    scale = jnp.maximum(jnp.max(jnp.abs(coeffs)), 1e-12)
    root_ok = jnp.abs(fval) / scale < 1e-3

    # u from the linear elimination: u = (Q(v)) / (2 (v cos_a - cos_c)) where
    # Q(v) = v^2 + m - n - 1, m = (c2/b2)(v^2-2v cos_b+1), n = (a2/b2)(...)
    g = v * v - 2.0 * v * cos_b + 1.0
    m = (c2 / b2_safe) * g
    n = (a2 / b2_safe) * g
    denom = 2.0 * (v * cos_a - cos_c)
    denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    u = (v * v + m - n - 1.0) / denom

    s1 = jnp.sqrt(b2_safe / jnp.maximum(g, 1e-12))
    s2 = u * s1
    s3 = v * s1
    pos = (s1 > 0) & (s2 > 0) & (s3 > 0) & (v > 0)
    valid = real_ok & root_ok & pos

    # Camera-frame points and absolute orientation per candidate.
    pc = jnp.stack(
        [s1[:, None] * f[0][None, :],
         s2[:, None] * f[1][None, :],
         s3[:, None] * f[2][None, :]],
        axis=1,
    )  # (4 candidates, 3 points, 3)

    # Closed-form rigid alignment via orthonormal triads: P3P camera points
    # have exactly matching pairwise distances, so no least-squares (SVD)
    # alignment is needed — R = camera_frame @ world_frame^T. This removes
    # 4 batched 3x3 SVDs per minimal sample (the RANSAC hot spot on TPU).
    def triad(p):
        e1 = p[..., 1, :] - p[..., 0, :]
        e2 = p[..., 2, :] - p[..., 0, :]
        u1 = e1 / jnp.maximum(
            jnp.linalg.norm(e1, axis=-1, keepdims=True), 1e-12
        )
        e2p = e2 - jnp.sum(e2 * u1, axis=-1, keepdims=True) * u1
        u2 = e2p / jnp.maximum(
            jnp.linalg.norm(e2p, axis=-1, keepdims=True), 1e-12
        )
        u3 = jnp.cross(u1, u2)
        return jnp.stack([u1, u2, u3], axis=-1)  # columns

    Fw = triad(world3)  # (3, 3)
    Fc = triad(pc)  # (4, 3, 3)
    Rs = Fc @ jnp.swapaxes(Fw, -1, -2)[None]
    cw = jnp.mean(world3, axis=0)
    cc = jnp.mean(pc, axis=1)
    ts = cc - jnp.einsum("kij,j->ki", Rs, cw)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), Rs.shape)
    Rs = jnp.where(valid[:, None, None], Rs, eye)
    ts = jnp.where(valid[:, None], ts, jnp.zeros_like(ts))
    return Rs, ts, valid
