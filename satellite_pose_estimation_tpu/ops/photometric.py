"""Device photometric corruption ops completing the reference's train-time
augmentation family (R1/datasets/speed.py:306-334):

* ``jpeg_artifacts``   — A.JpegCompression(20, 99): full YCbCr + 2x2 chroma
  subsampling + 8x8 DCT quantization round-trip. The DCT runs as dense 8x8
  matmuls over blocked reshapes — the whole simulator is MXU work, no host
  encode/decode. Quality follows the libjpeg table-scaling law, so the
  quantization error statistics track real JPEG encoders.
* ``iso_noise``        — A.ISONoise: HLS conversion, Poisson luminance
  noise with lambda = std(L) * intensity * 255, gaussian hue shift
  (sigma = color_shift * 360 * intensity); same formulation as
  albumentations' iso_noise, sampled with jax.random on device.
* ``motion_blur_kernel`` / ``median_blur3`` / ``box_blur`` — the OneOf blur
  family (MotionBlur / MedianBlur(3) / Blur(3)).

All ops take/return float32 RGB in [0, 255] with static shapes, vmap- and
jit-compatible (probabilistic gating happens in data/augment.py via
jnp.where, keeping one compiled program).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# --- JPEG ------------------------------------------------------------------

# ITU-T T.81 Annex K base quantization tables.
_Q_LUMA = np.asarray([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], np.float32)
_Q_CHROMA = np.asarray([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], np.float32)


def _dct_matrix():
    """Orthonormal 8x8 DCT-II matrix (plain numpy: this module may be
    lazily imported inside a jit trace, so no jnp at module scope)."""
    k = np.arange(8)
    C = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    C[0] *= 1 / np.sqrt(2)
    return (C * 0.5).astype(np.float32)


_DCT_NP = _dct_matrix()


def _quality_scale(quality):
    """libjpeg quality -> table scale percentage (jpeg_quality_scaling)."""
    q = jnp.clip(quality, 1.0, 100.0)
    return jnp.where(q < 50.0, 5000.0 / q, 200.0 - 2.0 * q)


def _scaled_table(base, quality):
    scale = _quality_scale(quality)
    return jnp.clip(jnp.floor((base * scale + 50.0) / 100.0), 1.0, 255.0)


def _blockwise_quantize(plane, table):
    """8x8 blocked DCT -> quantize -> inverse DCT, all matmuls.

    plane: (H, W) with H, W divisible by 8, centered at 0 (level-shifted).
    """
    H, W = plane.shape
    dct = jnp.asarray(_DCT_NP)
    blocks = plane.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)
    coef = jnp.einsum("ij,bcjk,lk->bcil", dct, blocks, dct)
    coef = jnp.round(coef / table) * table
    rec = jnp.einsum("ji,bcjk,kl->bcil", dct, coef, dct)
    return rec.transpose(0, 2, 1, 3).reshape(H, W)


def _pad_to(x, mult):
    H, W = x.shape[:2]
    ph = (-H) % mult
    pw = (-W) % mult
    if ph or pw:
        pad = [(0, ph), (0, pw)] + [(0, 0)] * (x.ndim - 2)
        x = jnp.pad(x, pad, mode="edge")
    return x, H, W


@partial(jax.jit, static_argnames=())
def jpeg_artifacts(img, quality):
    """JPEG round-trip simulation on an RGB [0,255] float image.

    4:2:0 chroma subsampling, quality-scaled Annex-K tables. ``quality`` is
    a traced scalar, so one compiled program covers the (20, 99) range of
    A.JpegCompression.
    """
    x, H, W = _pad_to(img.astype(jnp.float32), 16)

    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    tl = _scaled_table(jnp.asarray(_Q_LUMA), quality)
    tc = _scaled_table(jnp.asarray(_Q_CHROMA), quality)

    y_q = _blockwise_quantize(y - 128.0, tl) + 128.0

    def sub(c):  # 2x2 average pool
        h, w = c.shape
        return c.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))

    def up(c):  # nearest upsample
        return jnp.repeat(jnp.repeat(c, 2, axis=0), 2, axis=1)

    cb_q = up(_blockwise_quantize(sub(cb) - 128.0, tc) + 128.0)
    cr_q = up(_blockwise_quantize(sub(cr) - 128.0, tc) + 128.0)

    r2 = y_q + 1.402 * (cr_q - 128.0)
    g2 = y_q - 0.344136 * (cb_q - 128.0) - 0.714136 * (cr_q - 128.0)
    b2 = y_q + 1.772 * (cb_q - 128.0)
    out = jnp.stack([r2, g2, b2], axis=-1)[:H, :W]
    return jnp.clip(out, 0.0, 255.0)


# --- ISO noise ---------------------------------------------------------------

def _rgb_to_hls(img01):
    r, g, b = img01[..., 0], img01[..., 1], img01[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    l = (mx + mn) / 2.0
    d = mx - mn
    denom_s = jnp.where(l <= 0.5, mx + mn, 2.0 - mx - mn)
    s = jnp.where(d > 0, d / jnp.maximum(denom_s, 1e-12), 0.0)
    dd = jnp.maximum(d, 1e-12)
    h = jnp.where(
        mx == r, (g - b) / dd,
        jnp.where(mx == g, 2.0 + (b - r) / dd, 4.0 + (r - g) / dd),
    )
    h = jnp.where(d > 0, (h * 60.0) % 360.0, 0.0)
    return h, l, s


def _hls_to_rgb(h, l, s):
    c = (1.0 - jnp.abs(2.0 * l - 1.0)) * s
    hp = (h % 360.0) / 60.0
    x = c * (1.0 - jnp.abs(hp % 2.0 - 1.0))
    z = jnp.zeros_like(c)
    conds = [
        (hp < 1, (c, x, z)), (hp < 2, (x, c, z)), (hp < 3, (z, c, x)),
        (hp < 4, (z, x, c)), (hp < 5, (x, z, c)), (hp >= 5, (c, z, x)),
    ]
    r = g = b = z
    done = jnp.zeros_like(c, dtype=bool)
    for cond, (rr, gg, bb) in conds:
        take = cond & ~done
        r = jnp.where(take, rr, r)
        g = jnp.where(take, gg, g)
        b = jnp.where(take, bb, b)
        done = done | cond
    m = l - c / 2.0
    return jnp.stack([r + m, g + m, b + m], axis=-1)


def iso_noise(rng, img, color_shift=0.05, intensity=0.5,
              exact_poisson: bool = False):
    """Camera-sensor (ISO) noise, albumentations formulation: Poisson noise
    on HLS luminance (lambda = std(L)*intensity*255, applied as
    (n/255)*(1-L)) + gaussian hue shift (sigma = color_shift*360*intensity).
    img: (S, S, 3) RGB [0,255] float.

    By default the Poisson draw uses the rounded-normal approximation
    N(lam, lam) — the exact rejection sampler (jax.random.poisson) costs an
    order of magnitude more VPU time and lam is ~10-50 here, where the
    approximation is statistically indistinguishable for augmentation.
    """
    k1, k2 = jax.random.split(rng)
    h, l, s = _rgb_to_hls(img / 255.0)
    stddev = jnp.std(l)
    lam = jnp.maximum(stddev * intensity * 255.0, 1e-6)
    if exact_poisson:
        lum_noise = jax.random.poisson(k1, lam, shape=l.shape).astype(
            jnp.float32
        )
    else:
        lum_noise = jnp.maximum(
            jnp.round(lam + jnp.sqrt(lam) * jax.random.normal(k1, l.shape)),
            0.0,
        )
    color_noise = jax.random.normal(k2, h.shape) * (
        color_shift * 360.0 * intensity
    )
    h = (h + color_noise) % 360.0
    l = jnp.clip(l + (lum_noise / 255.0) * (1.0 - l), 0.0, 1.0)
    return jnp.clip(_hls_to_rgb(h, l, s) * 255.0, 0.0, 255.0)


# --- blur family -------------------------------------------------------------

def _depthwise(img, kernel):
    """(S,S,3) conv with one (k,k) kernel shared across channels, SAME/zero."""
    k = kernel.astype(jnp.float32)[None, None]  # OIHW (1,1,k,k)
    x = img.astype(jnp.float32).transpose(2, 0, 1)[:, None]  # (3,1,S,S)
    out = jax.lax.conv_general_dilated(x, k, (1, 1), "SAME")
    return out[:, 0].transpose(1, 2, 0)


def motion_blur_kernel(rng, max_ksize=7):
    """Random directed-line kernel (A.MotionBlur): odd length in
    [3, max_ksize] at a uniform angle, rasterized arithmetically on a fixed
    (max_ksize, max_ksize) grid so the shape stays static."""
    k1, k2 = jax.random.split(rng)
    n_sizes = (max_ksize - 3) // 2 + 1
    ksize = 3.0 + 2.0 * jax.random.randint(k1, (), 0, n_sizes)
    theta = jax.random.uniform(k2, minval=0.0, maxval=jnp.pi)
    c = (max_ksize - 1) / 2.0
    ii, jj = jnp.meshgrid(jnp.arange(max_ksize, dtype=jnp.float32),
                          jnp.arange(max_ksize, dtype=jnp.float32),
                          indexing="ij")
    dy, dx = ii - c, jj - c
    dirx, diry = jnp.cos(theta), jnp.sin(theta)
    across = jnp.abs(-dx * diry + dy * dirx)
    half = (ksize - 1.0) / 2.0
    # Rasterize: within half a cell of the line, clipped to the ksize box
    # (Chebyshev), like a cv2.line draw on the ksize x ksize sub-kernel.
    cheb = jnp.maximum(jnp.abs(dx), jnp.abs(dy))
    on = ((across <= 0.5) & (cheb <= half + 1e-3)).astype(jnp.float32)
    return on / jnp.maximum(on.sum(), 1.0)


def motion_blur(rng, img, max_ksize=7):
    return _depthwise(img, motion_blur_kernel(rng, max_ksize))


def median_blur3(img):
    """3x3 median filter (cv2.medianBlur(3), BORDER_REPLICATE)."""
    p = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    S = img.shape[0]
    stack = jnp.stack([
        p[di:di + S, dj:dj + S] for di in range(3) for dj in range(3)
    ])  # (9, S, S, 3)
    return jnp.sort(stack, axis=0)[4]


def box_blur(img, ksize=3):
    kernel = jnp.ones((ksize, ksize), jnp.float32) / (ksize * ksize)
    return _depthwise(img, kernel)
