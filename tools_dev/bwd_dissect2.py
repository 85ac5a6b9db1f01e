"""Dev-only: round-4 follow-up to bwd_dissect.py — the backbone backward
is near-ideal (bwd/fwd 2.07 with the forward at ~90% roofline); the gap
lives in the TRANSFORMER (fwd 37.6 / bwd 48.9 ms by difference, ~40%
efficiency) and the augment chain (30.2 ms). Dissect both:

* Transformer: encoder vs decoder split (layer-count differencing),
  fused-Pallas vs XLA encoder attention core A/B (fwd AND bwd),
* augment_batch: separable warp vs rotation subset vs photometric family.

    BD_BATCH=128 BD_INPUT=224 python tools_dev/bwd_dissect2.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

B = int(os.environ.get("BD_BATCH", "128"))
INPUT = int(os.environ.get("BD_INPUT", "224"))
ITERS = int(os.environ.get("BD_ITERS", "10"))
S8 = INPUT // 8


def timeit(name, fn, pool):
    out = fn(*pool[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    res = []
    for i in range(ITERS):
        res.append(jax.tree_util.tree_leaves(fn(*pool[i % len(pool)]))[0])
    jax.block_until_ready(res)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:52s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def time_transformer(label, n_enc, n_dec, impl=None):
    from satellite_pose_estimation_tpu.models import transformer as tr

    rng = np.random.RandomState(0)
    n_pool = max(4, ITERS)
    srcs = [jnp.asarray(rng.rand(B, S8, S8, 256), jnp.bfloat16)
            for _ in range(n_pool)]
    pos = jnp.asarray(rng.rand(S8, S8, 256), jnp.bfloat16)
    qe = jnp.asarray(rng.rand(20, 256), jnp.bfloat16)

    old_impl = tr._Attention.impl
    if impl is not None:
        tr._Attention.impl = impl
    try:
        model = tr.Transformer(
            d_model=256, nhead=8, num_encoder_layers=n_enc,
            num_decoder_layers=n_dec, dim_feedforward=2048, dropout=0.0,
            dtype=jnp.bfloat16)
        variables = model.init(jax.random.PRNGKey(0), srcs[0][:2], qe, pos,
                               deterministic=True)
        params = variables["params"]

        def scalar(p, src):
            hs, mem = model.apply({"params": p}, src, qe, pos,
                                  deterministic=True)
            return (jnp.sum(hs.astype(jnp.float32))
                    + jnp.sum(mem.astype(jnp.float32)))

        f = jax.jit(lambda src: scalar(params, src))
        g = jax.jit(jax.grad(scalar))
        tf = timeit(f"{label} fwd", f, [(s,) for s in srcs])
        tg = timeit(f"{label} grad", g, [(params, s) for s in srcs])
        print(f"{'':52s} bwd-only {(tg-tf)*1e3:8.2f} ms  "
              f"bwd/fwd {(tg-tf)/tf:5.2f}", flush=True)
        return tf, tg
    finally:
        tr._Attention.impl = old_impl


def time_augment():
    from satellite_pose_estimation_tpu.data import augment as au

    rng = np.random.RandomState(0)
    n_pool = max(4, ITERS)
    imgs = [jnp.asarray(rng.randint(0, 255, (B, 256, 256, 3)), jnp.uint8)
            for _ in range(n_pool)]
    bbs = jnp.tile(jnp.asarray([8.0, 8.0, 248.0, 248.0], jnp.float32),
                   (B, 1))
    lms = jnp.asarray(rng.rand(B, 11, 2) * 200 + 20, jnp.float32)
    keys = [jax.random.PRNGKey(i) for i in range(n_pool)]
    cfg = au.AugmentConfig(out_size=INPUT)

    full = jax.jit(lambda k, im: au.augment_batch(k, im, bbs, lms, cfg))
    timeit("augment full", full,
           [(keys[i], imgs[i]) for i in range(n_pool)])

    # warp-only: photometric probabilities forced to 0
    cfg_warp = cfg._replace(p_blur=0.0, p_blur_family=0.0, p_noise=0.0,
                            p_jpeg=0.0, p_iso=0.0, p_cutout=0.0, p_trunc=0.0)
    warp_rot = jax.jit(
        lambda k, im: au.augment_batch(k, im, bbs, lms, cfg_warp))
    timeit("augment warp+rotate (photo p=0)", warp_rot,
           [(keys[i], imgs[i]) for i in range(n_pool)])

    cfg_warp_only = cfg_warp._replace(p_rotate=0.0)
    warp_only = jax.jit(
        lambda k, im: au.augment_batch(k, im, bbs, lms, cfg_warp_only))
    timeit("augment warp only (rotate p=0, photo p=0)", warp_only,
           [(keys[i], imgs[i]) for i in range(n_pool)])

    cfg_no_rot = cfg._replace(p_rotate=0.0)
    no_rot = jax.jit(
        lambda k, im: au.augment_batch(k, im, bbs, lms, cfg_no_rot))
    timeit("augment photo+warp (rotate p=0)", no_rot,
           [(keys[i], imgs[i]) for i in range(n_pool)])


def main():
    print(f"== transformer @T={S8*S8} B={B} bf16 ==", flush=True)
    time_transformer("transformer 4enc+4dec (fused attn)", 4, 4)
    time_transformer("transformer 4enc+1dec", 4, 1)
    time_transformer("transformer 1enc+1dec", 1, 1)
    time_transformer("transformer 4enc+4dec (XLA attn)", 4, 4, impl="xla")
    print("== augment ==", flush=True)
    time_augment()


if __name__ == "__main__":
    main()
