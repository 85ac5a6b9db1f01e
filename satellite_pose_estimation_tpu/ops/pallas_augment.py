"""Fused photometric augmentation as a Pallas TPU kernel.

The train-time photometric chain (3x3 box blur -> additive gaussian noise
-> cutout holes -> edge truncation -> /255 + ImageNet normalize) is pure
elementwise/stencil work over the warped crop. As separate XLA ops it makes
five passes over HBM; this kernel does ONE pass: the crop tile lives in
VMEM, random bits come from the on-chip PRNG (pltpu.prng_random_bits), and
all branches are predicated (masked selects), so the memory traffic is
exactly read-once/write-once.

Layout: images are processed per (image, channel) grid cell as (S, S)
blocks — S=256 f32 tiles fit VMEM comfortably. Scalars (flags, sigma, seed)
ride in SMEM; the 10 cutout holes as a small prefetch array.

Falls back to the pure-JAX implementation in data/augment.py off-TPU; a
CPU interpret-mode test pins the kernel's semantics against that fallback.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def _photometric_kernel(scalars_ref, holes_ref, img_ref, out_ref,
                        noise_ref=None):
    """Grid cell = one (image, channel) plane.

    scalars_ref (SMEM, (1, 1, 8)): [do_blur, sigma, do_noise, do_cut,
        do_trunc, trunc_sel, th, tw] — THIS image's row, delivered by the
        BlockSpec index map. Blocking matters: an unblocked (B, 8)/(B, 10, 4)
        SMEM operand is padded per-element by the Mosaic window allocator
        and overflows the 1 MB SMEM at batch 128 ("Ran out of memory in
        memory space smem", measured on v5e). The extra unit dim satisfies
        Mosaic's block-shape rule (last two block dims must equal the
        array's or divide (8, 128) — (1, 8) over (B, 8) is rejected).
    holes_ref (SMEM, (1, H4, 4)): THIS image's cutout holes (x, y, w, h).
    img_ref/out_ref (VMEM, (S, S)): one channel plane in [0, 255].
    """
    def sc(j):  # per-image scalar j (pre-sliced row)
        return scalars_ref[0, 0, j]

    b = 0  # per-image rows are pre-sliced by the SMEM BlockSpecs
    c = pl.program_id(1)
    S = img_ref.shape[2]

    x = img_ref[0, 0, :, :]

    # --- 3x3 box blur via shifted adds (edge rows/cols replicate the
    # nearest interior average like a SAME conv with zero pad + renorm).
    do_blur = (sc(0) > 0.5).astype(jnp.float32)
    S_minus = S - 1
    up = pltpu.roll(x, 1, 0)
    down = pltpu.roll(x, S_minus, 0)  # roll requires non-negative shifts
    row3 = x + up + down
    left = pltpu.roll(row3, 1, 1)
    right = pltpu.roll(row3, S_minus, 1)
    blur = (row3 + left + right) / 9.0
    # roll wraps; mask the wrapped borders back to the raw pixel to match a
    # zero-pad SAME conv closely enough for augmentation purposes.
    rows = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    interior = (
        (rows > 0) & (rows < S - 1) & (cols > 0) & (cols < S - 1)
    )
    blurred = jnp.where(interior, blur, x)
    # scalar-predicated selects don't legalize in Mosaic; use arithmetic
    x = x + do_blur * (blurred - x)

    # --- additive gaussian noise: on-chip PRNG (Box-Muller) on TPU, or a
    # precomputed noise plane when the host provides one (CPU interpret).
    do_noise = (sc(2) > 0.5).astype(jnp.float32)
    sigma = sc(1)
    if noise_ref is None:
        u_bits = pltpu.prng_random_bits((S, S))
        v_bits = pltpu.prng_random_bits((S, S))
        # Mosaic lacks uint32->f32 casts; shift to 24 bits then go via
        # int32 (identical bit pattern below 2^31).
        u1 = pltpu.bitcast(
            pltpu.bitcast(u_bits, jnp.uint32) >> 8, jnp.int32
        ).astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-7
        u2 = pltpu.bitcast(
            pltpu.bitcast(v_bits, jnp.uint32) >> 8, jnp.int32
        ).astype(jnp.float32) * (1.0 / (1 << 24))
        gauss = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)
    else:
        gauss = noise_ref[0, 0, :, :]
    x = x + do_noise * gauss * sigma

    # --- cutout holes
    do_cut = (sc(3) > 0.5).astype(jnp.float32)
    hole_mask = jnp.zeros((S, S), jnp.bool_)
    for hi in range(holes_ref.shape[1]):
        hx = holes_ref[b, hi, 0]
        hy = holes_ref[b, hi, 1]
        hw = holes_ref[b, hi, 2]
        hh = holes_ref[b, hi, 3]
        inside = (
            (cols >= hx) & (cols < hx + hw) & (rows >= hy) & (rows < hy + hh)
        )
        hole_mask = hole_mask | inside
    x = x * (1.0 - do_cut * hole_mask.astype(jnp.float32))

    # --- edge truncation (img_trunc): top/left (sel<0.25) or bottom/right
    # (sel>0.75) bands zeroed.
    do_trunc = (sc(4) > 0.5).astype(jnp.float32)
    sel = sc(5)
    th = sc(6).astype(jnp.int32)
    tw = sc(7).astype(jnp.int32)
    top = ((rows < th) | (cols < tw)).astype(jnp.float32)
    bottom = ((rows >= S - th) | (cols >= S - tw)).astype(jnp.float32)
    is_top = (sel < 0.25).astype(jnp.float32)
    is_bot = (sel > 0.75).astype(jnp.float32)
    tmask = jnp.clip(is_top * top + is_bot * bottom, 0.0, 1.0)
    x = x * (1.0 - do_trunc * tmask)

    # --- clip + normalize for this channel
    x = jnp.clip(x, 0.0, 255.0)
    c0 = (c == 0).astype(jnp.float32)
    c1 = (c == 1).astype(jnp.float32)
    c2 = (c == 2).astype(jnp.float32)
    mean = c0 * IMAGENET_MEAN[0] + c1 * IMAGENET_MEAN[1] + c2 * IMAGENET_MEAN[2]
    std = c0 * IMAGENET_STD[0] + c1 * IMAGENET_STD[1] + c2 * IMAGENET_STD[2]
    out_ref[0, 0, :, :] = (x / 255.0 - mean) / std


def _seed_kernel_wrapper(seed_ref, scalars_ref, holes_ref, img_ref, out_ref):
    b = pl.program_id(0)
    c = pl.program_id(1)
    pltpu.prng_seed(seed_ref[0] + b * 3 + c)
    _photometric_kernel(scalars_ref, holes_ref, img_ref, out_ref)


def _noise_input_kernel(scalars_ref, holes_ref, img_ref, noise_ref, out_ref):
    _photometric_kernel(scalars_ref, holes_ref, img_ref, out_ref, noise_ref)


@partial(jax.jit, static_argnames=("interpret",))
def fused_photometric_pallas(images, scalars, holes, seed, interpret=False,
                             noise=None):
    """Apply the fused photometric chain.

    Args:
        images: (B, S, S, 3) float32 in [0, 255] (post-geometric-warp).
        scalars: (B, 8) float32 per-image parameters (see kernel doc).
        holes: (B, NH, 4) int32 cutout holes.
        seed: () int32 PRNG seed.
    Returns:
        (B, S, S, 3) float32 ImageNet-normalized.
    """
    B, S, _, C = images.shape
    NH = holes.shape[1]
    planes = images.transpose(0, 3, 1, 2)  # (B, 3, S, S)
    img_spec = pl.BlockSpec(
        (1, 1, S, S), lambda b, c: (b, c, 0, 0), memory_space=pltpu.VMEM
    )
    # Per-image SMEM blocks (see kernel doc: unblocked SMEM operands pad
    # out and overflow the 1 MB SMEM at train batch sizes). scalars gain a
    # unit middle dim so the block's last two dims equal the array's
    # (Mosaic's block-shape rule).
    scalars3 = scalars.astype(jnp.float32).reshape(B, 1, 8)
    scal_spec = pl.BlockSpec(
        (1, 1, 8), lambda b, c: (b, 0, 0), memory_space=pltpu.SMEM
    )
    holes_spec = pl.BlockSpec(
        (1, NH, 4), lambda b, c: (b, 0, 0), memory_space=pltpu.SMEM
    )

    if noise is not None:
        # Host-provided noise planes (B, S, S) broadcast per channel; used
        # on backends without the Pallas PRNG (CPU interpret tests).
        noise_planes = jnp.broadcast_to(
            noise[:, None, :, :], (B, C, S, S)
        ).astype(jnp.float32)
        out = pl.pallas_call(
            _noise_input_kernel,
            out_shape=jax.ShapeDtypeStruct((B, C, S, S), jnp.float32),
            grid=(B, C),
            in_specs=[
                scal_spec,
                holes_spec,
                img_spec,
                img_spec,
            ],
            out_specs=img_spec,
            interpret=interpret,
        )(scalars3, holes.astype(jnp.int32), planes,
          noise_planes)
    else:
        out = pl.pallas_call(
            _seed_kernel_wrapper,
            out_shape=jax.ShapeDtypeStruct((B, C, S, S), jnp.float32),
            grid=(B, C),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (scalar)
                scal_spec,
                holes_spec,
                img_spec,
            ],
            out_specs=img_spec,
            interpret=interpret,
        )(
            jnp.asarray([seed], jnp.int32),
            scalars3,
            holes.astype(jnp.int32),
            planes,
        )
    return out.transpose(0, 2, 3, 1)
