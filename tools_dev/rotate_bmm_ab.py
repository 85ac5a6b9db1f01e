"""Dev-only: A/B the per-row-matrix (bmm) 3-shear rotation against
rotate_shear3's binary-shift form (bwd_dissect3.py found 24.5 ms vs
8.0 ms unwidened-bmm for the 51-image subset @224). Variants: widened
canvas (the correctness-preserving form), bf16 weight tensors, cubic
taps. Also checks numerical agreement vs rotate_shear3.

    python tools_dev/rotate_bmm_ab.py          # TPU timing
    RB_CPU=1 python tools_dev/rotate_bmm_ab.py # CPU correctness only
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("RB_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

S = 224
N_ROT = 51
ITERS = 10


def shear_rows_bmm(im, shifts, out_w, cubic, wdtype):
    """out[r, x, c] = sum_w K((x + shifts[r]) - w) * im[r, w, c] — the
    1-D constant-border resample of every row as ONE batched matmul."""
    in_w = im.shape[1]
    grid_w = jnp.arange(in_w, dtype=jnp.float32)
    x = jnp.arange(out_w, dtype=jnp.float32)
    src = x[None, :] + shifts[:, None]  # (R, out_w)
    d = src[:, :, None] - grid_w[None, None, :]  # (R, out_w, in_w)
    if cubic:
        ad = jnp.abs(d)
        a = -0.75  # cv2 INTER_CUBIC Keys kernel
        w = jnp.where(
            ad <= 1.0,
            (a + 2.0) * ad**3 - (a + 3.0) * ad**2 + 1.0,
            jnp.where(ad < 2.0,
                      a * ad**3 - 5.0 * a * ad**2 + 8.0 * a * ad - 4.0 * a,
                      0.0),
        )
    else:
        w = jnp.clip(1.0 - jnp.abs(d), 0.0, 1.0)
    return jnp.einsum("rxw,rwc->rxc", w.astype(wdtype), im.astype(wdtype),
                      preferred_element_type=jnp.float32)


def rotate_shear3_bmm(image, theta, cubic=False, wdtype=jnp.float32):
    """Widened-canvas Paeth 3-shear rotation, each shear a batched matmul
    (same sampling semantics as rotate_shear3)."""
    Simg = image.shape[0]
    img = image.astype(jnp.float32)
    c = (Simg - 1.0) / 2.0
    a = -jnp.tan(theta / 2.0)
    b = jnp.sin(theta)
    pad = (Simg + 1) // 2
    Wp = Simg + 2 * pad
    y = jnp.arange(Simg, dtype=jnp.float32)

    s1 = -pad - a * (y - c)
    out1 = shear_rows_bmm(img, s1, Wp, cubic, wdtype)  # (S, Wp, C)

    xp = jnp.arange(Wp, dtype=jnp.float32)
    s2 = -b * (xp - (c + pad))
    out2 = shear_rows_bmm(out1.transpose(1, 0, 2), s2, Simg, cubic,
                          wdtype).transpose(1, 0, 2)  # (S, Wp, C)

    s3 = pad - a * (y - c)
    return shear_rows_bmm(out2, s3, Simg, cubic, wdtype)  # (S, S, C)


def timeit(name, fn, pool):
    out = fn(*pool[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    res = [fn(*pool[i % len(pool)]) for i in range(ITERS)]
    jax.block_until_ready(res)
    print(f"{name:52s} {(time.perf_counter()-t0)/ITERS*1e3:9.2f} ms",
          flush=True)


def main():
    from satellite_pose_estimation_tpu.ops.image_warp import rotate_shear3

    rng = np.random.RandomState(0)
    thetas = jnp.asarray(rng.uniform(-1.5, 1.5, (N_ROT,)), jnp.float32)

    # --- correctness vs rotate_shear3 (single image)
    img = jnp.asarray(rng.rand(S, S, 3) * 255, jnp.float32)
    for cubic in (False, True):
        for th in (0.3, -1.2, 1.5):
            ref = rotate_shear3(img, jnp.float32(th), cubic)
            got = rotate_shear3_bmm(img, jnp.float32(th), cubic)
            err = float(jnp.max(jnp.abs(ref - got)))
            print(f"cubic={cubic} theta={th:+.1f} max|diff|={err:.4f} "
                  f"(range 0..255)", flush=True)

    if os.environ.get("RB_CPU") == "1":
        return

    # --- timing (TPU)
    n_pool = max(4, ITERS)
    imgs = [jnp.asarray(rng.rand(N_ROT, S, S, 3) * 255, jnp.float32)
            for _ in range(n_pool)]

    f_ref = jax.jit(jax.vmap(lambda im, th: rotate_shear3(im, th, False)),
                    static_argnums=())
    timeit("rotate_shear3 (binary shifts)", lambda im: f_ref(im, thetas),
           [(im,) for im in imgs])
    for wdtype, label in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        f = jax.jit(jax.vmap(
            lambda im, th: rotate_shear3_bmm(im, th, False, wdtype)))
        timeit(f"rotate_shear3_bmm widened {label}",
               lambda im, f=f: f(im, thetas), [(im,) for im in imgs])
    f = jax.jit(jax.vmap(
        lambda im, th: rotate_shear3_bmm(im, th, True, jnp.float32)))
    timeit("rotate_shear3_bmm widened f32 CUBIC",
           lambda im: f(im, thetas), [(im,) for im in imgs])

    # DFT-shift form (ops/image_warp.rotate_shear3_fft): full-lane matmuls
    from satellite_pose_estimation_tpu.ops.image_warp import (
        rotate_shear3_fft,
    )

    for prec, label in ((jax.lax.Precision.HIGHEST, "HIGHEST"),
                        (jax.lax.Precision.HIGH, "HIGH"),
                        (jax.lax.Precision.DEFAULT, "DEFAULT")):
        f = jax.jit(jax.vmap(
            lambda im, th: rotate_shear3_fft(im, th, False, prec)))
        timeit(f"rotate_shear3_fft prec={label}",
               lambda im, th, f=f: f(im, th),
               [(im, thetas) for im in imgs])
        # on-device error vs the bmm reference (precision semantics differ
        # on TPU vs CPU — measure where it runs)
        ref = jax.jit(jax.vmap(
            lambda im, th: rotate_shear3_bmm(im, th, False)))(
            imgs[0], thetas)
        got = f(imgs[0], thetas)
        d = jnp.abs(ref - got)
        print(f"  err vs bmm: median={float(jnp.median(d)):.4f} "
              f"max={float(jnp.max(d)):.3f}", flush=True)
    f = jax.jit(jax.vmap(
        lambda im, th: rotate_shear3_fft(im, th, True)))
    timeit("rotate_shear3_fft HIGHEST CUBIC",
           lambda im: f(im, thetas), [(im,) for im in imgs])


if __name__ == "__main__":
    main()
