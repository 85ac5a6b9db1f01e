"""Dev-only: dissect WHY the rotation passes are slow on TPU.

Variants:
  v0_gather      current direct inverse-affine gather (baseline)
  v1_shear_cl    3-shear, channel-last (R, W, 3), vmapped dynamic_slice
  v2_shear_cf    3-shear, channel-first (3, R, W), vmapped dynamic_slice
  v3_shear_bin   3-shear, channel-first, binary-decomposition shifts
  v4_blendonly   channel-first static-tap blend only (no integer shift)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

S = int(os.environ.get("BR_SIZE", "256"))
NROT = int(os.environ.get("BR_N", "51"))
ITERS = int(os.environ.get("BR_ITERS", "10"))


def timeit(name, fn, pool):
    acc = jnp.sum(fn(pool[0])) + jnp.sum(fn(pool[1]))
    float(acc)
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for i in range(ITERS):
        acc = acc + jnp.sum(fn(pool[i % len(pool)]))
    _ = float(acc)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:28s} {dt*1e3:9.2f} ms/iter", flush=True)
    return dt


def _cubicless_blend_2d(arr, t):
    # (R, Win): bilinear static-tap blend, frac t per row
    R, Win = arr.shape
    padded = jnp.pad(arr, ((0, 0), (0, 1)))
    return (1.0 - t)[:, None] * padded[:, :Win] + t[:, None] * padded[:, 1:]


def _shear2d_slice(arr, shift, out_len, lo, hi):
    R, Win = arr.shape
    m = jnp.floor(shift)
    t = shift - m
    mi = jnp.clip(m.astype(jnp.int32), lo, hi)
    blend = _cubicless_blend_2d(arr, t)
    pl, pr = -lo, max(0, hi + out_len - Win)
    blend = jnp.pad(blend, ((0, 0), (pl, pr)))

    def slice_row(row, start):
        return jax.lax.dynamic_slice(row, (start,), (out_len,))

    return jax.vmap(slice_row)(blend, mi + pl)


def _shear2d_binary(arr, shift, out_len, lo, hi):
    R, Win = arr.shape
    m = jnp.floor(shift)
    t = shift - m
    mi = jnp.clip(m.astype(jnp.int32), lo, hi)
    blend = _cubicless_blend_2d(arr, t)
    pl, pr = -lo, max(0, hi + out_len - Win)
    cur = jnp.pad(blend, ((0, 0), (pl, pr)))
    starts = mi + pl  # in [0, hi - lo]
    span = hi - lo
    Wpad = Win + pl + pr
    k = 0
    while (1 << k) <= span:
        sh = 1 << k
        shifted = jnp.pad(cur[:, sh:], ((0, 0), (0, sh)))
        bit = ((starts >> k) & 1).astype(bool)
        cur = jnp.where(bit[:, None], shifted, cur)
        k += 1
    return cur[:, :out_len]


def rotate3_2d(img_cf, theta, shear2d):
    # img_cf: (C, S, S) channel-first
    C, S_, _ = img_cf.shape
    c = (S_ - 1.0) / 2.0
    a = -jnp.tan(theta / 2.0)
    b = jnp.sin(theta)
    pad = (S_ + 1) // 2
    Wp = S_ + 2 * pad
    y = jnp.arange(S_, dtype=jnp.float32)

    s1 = -pad - a * (y - c)
    out1 = jax.vmap(lambda ch: shear2d(ch, s1, Wp, -S_ - 1, 0))(img_cf)
    xp = jnp.arange(Wp, dtype=jnp.float32)
    s2 = -b * (xp - (c + pad))
    out2 = jax.vmap(
        lambda ch: shear2d(ch.T, s2, S_, -S_ - 1, S_ + 1).T
    )(out1)
    s3 = pad - a * (y - c)
    return jax.vmap(lambda ch: shear2d(ch, s3, S_, -1, S_ + 1))(out2)


def main():
    from satellite_pose_estimation_tpu.ops.image_warp import (
        affine_warp_bilinear, rotate_shear3)

    rng = np.random.RandomState(0)
    thetas = jnp.asarray(rng.uniform(-1.5, 1.5, NROT), jnp.float32)
    pool_cl = [jnp.asarray(rng.rand(NROT, S, S, 3) * 255, jnp.float32)
               for _ in range(2)]
    pool_cf = [jnp.transpose(p, (0, 3, 1, 2)) for p in pool_cl]
    c = (S - 1.0) / 2.0

    def rot_one(im, th):
        cos, sin = jnp.cos(th), jnp.sin(th)
        M = jnp.asarray([
            [cos, sin, c - cos * c - sin * c],
            [-sin, cos, c + sin * c - cos * c],
        ])
        return affine_warp_bilinear(im, M, S, normalize=False)

    timeit("v0_gather", jax.jit(
        lambda x: jax.vmap(rot_one)(x, thetas)), pool_cl)

    timeit("v1_shear_cl", jax.jit(lambda x: jax.vmap(
        lambda im, th: rotate_shear3(im, th))(x, thetas)), pool_cl)

    timeit("v2_shear_cf", jax.jit(lambda x: jax.vmap(
        lambda im, th: rotate3_2d(im, th, _shear2d_slice))(x, thetas)),
        pool_cf)

    timeit("v3_shear_bin", jax.jit(lambda x: jax.vmap(
        lambda im, th: rotate3_2d(im, th, _shear2d_binary))(x, thetas)),
        pool_cf)

    def blend_only(x):
        y = jnp.arange(S, dtype=jnp.float32)
        t = (0.3 * y) % 1.0
        return jax.vmap(jax.vmap(
            lambda ch: _cubicless_blend_2d(ch, t)))(x)

    timeit("v4_blendonly", jax.jit(blend_only), pool_cf)


if __name__ == "__main__":
    main()
