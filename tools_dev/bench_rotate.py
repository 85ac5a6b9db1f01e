"""Dev-only: rotation-subset timing on TPU — gather warp vs 3-shear.

Also times the full augment_batch under both rotate_impl settings.
Methodology per CLAUDE.md: pool of distinct inputs, chained dispatches,
one float() sync at the end.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

B = int(os.environ.get("BR_BATCH", "128"))
S = int(os.environ.get("BR_SIZE", "256"))
NROT = int(round(0.4 * B))
ITERS = int(os.environ.get("BR_ITERS", "10"))
ONLY = os.environ.get("BR_ONLY", "").split(",") if os.environ.get("BR_ONLY") else None


def timeit(name, fn, pool):
    acc = jnp.sum(fn(pool[0]))
    acc = acc + jnp.sum(fn(pool[1 % len(pool)]))
    float(acc)
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for i in range(ITERS):
        acc = acc + jnp.sum(fn(pool[i % len(pool)]))
    _ = float(acc)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:40s} {dt*1e3:9.2f} ms/iter", flush=True)
    return dt


def main():
    from satellite_pose_estimation_tpu.ops.image_warp import (
        affine_warp_bilinear, rotate_shear3)
    from satellite_pose_estimation_tpu.data.augment import (
        AugmentConfig, augment_batch)

    rng = np.random.RandomState(0)
    c = (S - 1.0) / 2.0
    thetas = jnp.asarray(rng.uniform(-1.5, 1.5, NROT), jnp.float32)

    def want(n):
        return ONLY is None or n in ONLY

    if want("rot"):
        pool = [jnp.asarray(rng.rand(NROT, S, S, 3) * 255, jnp.float32)
                for _ in range(3)]

        def rot_one(im, th):
            cos, sin = jnp.cos(th), jnp.sin(th)
            M = jnp.asarray([
                [cos, sin, c - cos * c - sin * c],
                [-sin, cos, c + sin * c - cos * c],
            ])
            return affine_warp_bilinear(im, M, S, normalize=False)

        g = jax.jit(lambda x: jax.vmap(rot_one)(x, thetas))
        timeit(f"gather rot n={NROT} @{S}", g, pool)

        sh = jax.jit(lambda x: jax.vmap(
            lambda im, th: rotate_shear3(im, th))(x, thetas))
        timeit(f"3-shear rot n={NROT} @{S}", sh, pool)

        from satellite_pose_estimation_tpu.ops.pallas_rotate import (
            rotate_shear3_pallas)

        pk = jax.jit(lambda x: rotate_shear3_pallas(x, thetas))
        timeit(f"pallas rot n={NROT} @{S}", pk, pool)

    if want("aug"):
        key = jax.random.PRNGKey(0)
        P = 256
        imgs = [jnp.asarray(rng.randint(0, 255, (B, P, P, 3)), jnp.uint8)
                for _ in range(3)]
        bbox = jnp.tile(jnp.asarray([10.0, 8.0, 240.0, 238.0]), (B, 1))
        lms = jnp.asarray(rng.rand(B, 11, 2) * 200 + 20, jnp.float32)
        for impl in ("gather", "shear"):
            cfg = AugmentConfig(out_size=S, rotate_impl=impl)
            f = jax.jit(lambda x, cfg=cfg: augment_batch(
                key, x, bbox, lms, cfg)[0])
            timeit(f"augment_batch B={B} rotate={impl}", f, imgs)


if __name__ == "__main__":
    main()
