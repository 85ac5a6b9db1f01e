"""Paeth 3-shear rotation as a single Pallas TPU kernel.

The XLA formulation (ops/image_warp.rotate_shear3) runs ~28 shifted-copy
passes, each a full HBM round-trip over the padded canvases (31 ms for a
51-image 256^2 subset on v5e). Here the whole rotation happens in VMEM:
one grid cell per (image, channel) plane loads the (S, S) block once,
performs the three shears — fractional tap blend + binary-decomposed
integer shifts, all as lane/sublane rolls with arithmetic masking — on
VMEM scratch canvases, and writes the (S, S) result once. Memory traffic
is exactly read-once/write-once.

Semantics are identical to rotate_shear3 (same shifts, same taps, same
BORDER_CONSTANT-zero behavior — the train-time Rotate of
R1/datasets/speed.py:306-313); an interpret-mode test pins them together.
Mosaic constraints honored: no scalar-predicated selects (arithmetic
masking), non-negative roll shifts only.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cubic_w(s, a=-0.75):
    """Catmull-Rom weight for |offset| s (elementwise, no stacking)."""
    s = jnp.abs(s)
    w1 = ((a + 2.0) * s - (a + 3.0)) * s * s + 1.0
    w2 = ((a * s - 5.0 * a) * s + 8.0 * a) * s - 4.0 * a
    inner = (s <= 1.0).astype(jnp.float32)
    outer = ((s > 1.0) & (s < 2.0)).astype(jnp.float32)
    return inner * w1 + outer * w2


def _roll_zero(x, sh, axis):
    """Shift x by +sh source offset along axis (out[i] = x[i + sh]),
    zero-filling: a non-negative-roll plus an iota mask."""
    n = x.shape[axis]
    sh = sh % n
    if sh == 0:
        return x
    rolled = pltpu.roll(x, n - sh, axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    return rolled * (idx < n - sh).astype(x.dtype)


def _roll_zero_neg(x, sh, axis):
    """out[i] = x[i - sh] (shift content right/down), zero-filling."""
    n = x.shape[axis]
    if sh == 0:
        return x
    rolled = pltpu.roll(x, sh, axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    return rolled * (idx >= sh).astype(x.dtype)


def _blend(x, t, axis, cubic):
    """Fractional tap blend along axis with per-row/col frac t (same
    shape as x): bilinear 2-tap or Catmull-Rom 4-tap, taps outside read 0."""
    if cubic:
        xm1 = _roll_zero_neg(x, 1, axis)
        x1 = _roll_zero(x, 1, axis)
        x2 = _roll_zero(x, 2, axis)
        return (
            _cubic_w(t + 1.0) * xm1
            + _cubic_w(t) * x
            + _cubic_w(1.0 - t) * x1
            + _cubic_w(2.0 - t) * x2
        )
    x1 = _roll_zero(x, 1, axis)
    return (1.0 - t) * x + t * x1


def _binary_shift(cur, starts, span, axis):
    """out[i] = cur[i + starts[i...]] via log2(span) static rolls gated by
    the shift's bits (arithmetic masking; starts in [0, span])."""
    k = 0
    while (1 << k) <= span:
        sh = 1 << k
        shifted = _roll_zero(cur, sh, axis)
        bit = ((starts >> k) & 1).astype(jnp.float32)
        cur = cur + bit * (shifted - cur)
        k += 1
    return cur


def _make_kernel(S, XA, YB, cubic):
    pad = (S + 1) // 2
    Wp = S + 2 * pad
    c = (S - 1.0) / 2.0

    def kernel(ab_ref, img_ref, out_ref, cA, cB):
        i = pl.program_id(0)
        a = ab_ref[i, 0]
        b = ab_ref[i, 1]
        x = img_ref[0, 0, :, :].astype(jnp.float32)  # (S, S)

        # ---- shear 1 (x): src x0 = w - pad - a(y - c)
        rows_s = jax.lax.broadcasted_iota(
            jnp.int32, (S, S), 0).astype(jnp.float32)
        s1 = -pad - a * (rows_s - c)
        m1 = jnp.floor(s1)
        t1 = s1 - m1
        blend1 = _blend(x, t1, 1, cubic)
        pl1 = S + 1
        cA[:, :] = jnp.zeros((S, XA), jnp.float32)
        cA[:, pl1 : pl1 + S] = blend1
        rows_a = jax.lax.broadcasted_iota(
            jnp.int32, (S, XA), 0).astype(jnp.float32)
        s1a = -pad - a * (rows_a - c)
        starts1 = (
            jnp.clip(jnp.floor(s1a), -S - 1.0, 0.0).astype(jnp.int32) + pl1
        )
        out1 = _binary_shift(cA[:, :], starts1, S + 1, 1)[:, :Wp]

        # ---- shear 2 (y): src y1 = y - b(x - (c + pad))
        cols_w = jax.lax.broadcasted_iota(
            jnp.int32, (S, Wp), 1).astype(jnp.float32)
        s2 = -b * (cols_w - (c + pad))
        m2 = jnp.floor(s2)
        t2 = s2 - m2
        blend2 = _blend(out1, t2, 0, cubic)
        pt2 = S + 1
        cB[:, :] = jnp.zeros((YB, Wp), jnp.float32)
        cB[pt2 : pt2 + S, :] = blend2
        cols_b = jax.lax.broadcasted_iota(
            jnp.int32, (YB, Wp), 1).astype(jnp.float32)
        s2b = -b * (cols_b - (c + pad))
        starts2 = (
            jnp.clip(jnp.floor(s2b), -S - 1.0, S + 1.0).astype(jnp.int32)
            + pt2
        )
        out2 = _binary_shift(cB[:, :], starts2, 2 * S + 2, 0)[:S, :]

        # ---- shear 3 (x): src x1p = w + pad - a(y - c)
        rows_w = jax.lax.broadcasted_iota(
            jnp.int32, (S, Wp), 0).astype(jnp.float32)
        s3 = pad - a * (rows_w - c)
        m3 = jnp.floor(s3)
        t3 = s3 - m3
        blend3 = _blend(out2, t3, 1, cubic)
        cA[:, :] = jnp.zeros((S, XA), jnp.float32)
        cA[:, 1 : 1 + Wp] = blend3
        rows_a2 = jax.lax.broadcasted_iota(
            jnp.int32, (S, XA), 0).astype(jnp.float32)
        s3a = pad - a * (rows_a2 - c)
        starts3 = (
            jnp.clip(jnp.floor(s3a), -1.0, S + 1.0).astype(jnp.int32) + 1
        )
        out3 = _binary_shift(cA[:, :], starts3, S + 2, 1)[:, :S]
        out_ref[0, 0, :, :] = out3

    return kernel


def _ceil_to(v, m):
    return ((v + m - 1) // m) * m


@partial(jax.jit, static_argnames=("cubic", "interpret"))
def rotate_shear3_pallas(images, thetas, cubic=False, interpret=False):
    """Rotate (N, S, S, C) images by per-image thetas about their centers.

    Fused-VMEM variant of ops/image_warp.rotate_shear3 (same semantics);
    |theta| must be <= pi/2.
    """
    N, S, _, C = images.shape
    pad = (S + 1) // 2
    Wp = S + 2 * pad
    XA = _ceil_to(S + 1 + Wp + 1, 128)
    YB = _ceil_to(3 * S + 2 + 8, 8)

    planes = images.astype(jnp.float32).transpose(0, 3, 1, 2)  # (N, C, S, S)
    ab = jnp.stack(
        [-jnp.tan(thetas / 2.0), jnp.sin(thetas)], axis=1
    ).astype(jnp.float32)

    spec = pl.BlockSpec(
        (1, 1, S, S), lambda n, c: (n, c, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _make_kernel(S, XA, YB, cubic),
        out_shape=jax.ShapeDtypeStruct((N, C, S, S), jnp.float32),
        grid=(N, C),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec],
        out_specs=spec,
        scratch_shapes=[
            pltpu.VMEM((S, XA), jnp.float32),
            pltpu.VMEM((YB, Wp), jnp.float32),
        ],
        interpret=interpret,
    )(ab, planes)
    return out.transpose(0, 2, 3, 1)
