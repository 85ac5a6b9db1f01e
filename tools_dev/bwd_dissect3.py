"""Dev-only: round-4 deep dive, stage 3 — per-op encoder-layer backward
(attention vs FFN vs LayerNorm at T=784) and the augment rotation subset
(rotate_shear3 vs alternatives). Follow-up to bwd_dissect2.py which
localized the train-step gap to the encoder-layer backward (17.8 ms/layer
vs 5.2 fwd, ratio 3.4) and the rotation subset (~21 ms of the 30 ms
augment).

    BD_BATCH=128 python tools_dev/bwd_dissect3.py
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

B = int(os.environ.get("BD_BATCH", "128"))
T = int(os.environ.get("BD_T", "784"))
ITERS = int(os.environ.get("BD_ITERS", "10"))


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


def fwd_bwd(name, module, variables, pool, **apply_kw):
    params = variables["params"]

    def scalar(p, *args):
        out = module.apply({"params": p}, *args, **apply_kw)
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree_util.tree_leaves(out))

    f = jax.jit(lambda *a: scalar(params, *a))
    g = jax.jit(jax.grad(scalar))
    tf = timeit(f"{name} fwd", f, pool)
    tg = timeit(f"{name} grad", g, [(params, *a) for a in pool])
    print(f"{'':52s} bwd-only {(tg-tf)*1e3:8.2f} ms  "
          f"bwd/fwd {(tg-tf)/tf:5.2f}", flush=True)
    return tf, tg


def main():
    from flax import linen as nn

    from satellite_pose_estimation_tpu.models import transformer as tr

    rng = np.random.RandomState(0)
    n_pool = max(4, ITERS)
    xs = [jnp.asarray(rng.rand(B, T, 256), jnp.bfloat16)
          for _ in range(n_pool)]
    pos = jnp.asarray(rng.rand(1, T, 256), jnp.bfloat16)

    # full encoder layer
    layer = tr.EncoderLayer(256, 8, 2048, 0.0, dtype=jnp.bfloat16)
    v = layer.init(jax.random.PRNGKey(0), xs[0][:2], pos, True)
    fwd_bwd("encoder layer", layer, v, [(x, pos, True) for x in xs])

    # attention alone (each impl)
    for impl in ("fused", "xla", "flash"):
        att = tr._Attention(256, 8, 0.0, jnp.bfloat16, impl=impl)
        va = att.init(jax.random.PRNGKey(0), xs[0][:2], xs[0][:2], xs[0][:2],
                      True)
        fwd_bwd(f"attention impl={impl}", att, va,
                [(x, x, x, True) for x in xs])

    # FFN alone
    class FFN(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Dense(2048, dtype=jnp.bfloat16, name="linear1")(x)
            return nn.Dense(256, dtype=jnp.bfloat16, name="linear2")(
                nn.relu(h))

    ffn = FFN()
    vf = ffn.init(jax.random.PRNGKey(0), xs[0][:2])
    fwd_bwd("FFN 256->2048->256", ffn, vf, [(x,) for x in xs])

    # LayerNorm x2 alone
    class LNs(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16, name="n1")(x)
            return nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16,
                                name="n2")(x)

    lns = LNs()
    vl = lns.init(jax.random.PRNGKey(0), xs[0][:2])
    fwd_bwd("2x LayerNorm", lns, vl, [(x,) for x in xs])

    # --- rotation subset alternatives
    print("== rotation subset (51 of 128 @224) ==", flush=True)
    from satellite_pose_estimation_tpu.ops.image_warp import rotate_shear3

    imgs = [jnp.asarray(rng.rand(B, 224, 224, 3), jnp.float32)
            for _ in range(n_pool)]
    n_rot = 51
    thetas = jnp.asarray(rng.uniform(-1.5, 1.5, (n_rot,)), jnp.float32)
    thetas_all = jnp.asarray(rng.uniform(-1.5, 1.5, (B,)), jnp.float32)
    idx = jnp.asarray(rng.permutation(B)[:n_rot])

    def rot_subset(img):
        sub = jnp.take(img, idx, axis=0)
        rot = jax.vmap(lambda im, th: rotate_shear3(im, th, False))(
            sub, thetas)
        return img.at[idx].set(rot)

    timeit("take + shear3(51) + scatter  [current]",
           jax.jit(rot_subset), [(im,) for im in imgs])

    def rot_subset_nogather(img):
        th = jnp.where(jnp.isin(jnp.arange(B), idx), thetas_all, 0.0)
        return jax.vmap(lambda im, t: rotate_shear3(im, t, False))(img, th)

    timeit("shear3(all 128, zero-angle passthrough)",
           jax.jit(rot_subset_nogather), [(im,) for im in imgs])

    def shear_only(img):
        sub = jnp.take(img, idx, axis=0)
        return jax.vmap(lambda im, th: rotate_shear3(im, th, False))(
            sub, thetas)

    timeit("take + shear3(51) (no scatter)",
           jax.jit(shear_only), [(im,) for im in imgs])

    # per-row-matrix batched-matmul rotation (3 shears as bmm)
    def shear_x_mat(th_tan):  # (H,) per-row shift -> (H, W, W) too big;
        pass

    # dense one-shot: rotation by per-image angle via two batched matmuls
    # is impossible (non-separable); instead shear as bmm over rows:
    S = 224

    def shear_rows_bmm(im, shifts):
        # out[r, x, c] = sum_w M[r, x, w] * im[r, w, c], M = frac shift
        grid = jnp.arange(S, dtype=jnp.float32)
        src = grid[None, :] - shifts[:, None]  # (H, W) source coords
        w = jnp.clip(1.0 - jnp.abs(src[:, :, None] - grid[None, None, :]),
                     0.0, 1.0)  # (H, W, W) bilinear weights
        return jnp.einsum("rxw,rwc->rxc", w, im)

    def rot3_bmm(im, th):
        a = -jnp.tan(th / 2)
        b = jnp.sin(th)
        c = (S - 1) / 2.0
        rows = jnp.arange(S, dtype=jnp.float32) - c
        im = shear_rows_bmm(im, rows * a)
        im = jnp.transpose(im, (1, 0, 2))
        im = shear_rows_bmm(im, rows * b)
        im = jnp.transpose(im, (1, 0, 2))
        im = shear_rows_bmm(im, rows * a)
        return im

    def rot_subset_bmm(img):
        sub = jnp.take(img, idx, axis=0)
        rot = jax.vmap(rot3_bmm)(sub, thetas)
        return img.at[idx].set(rot)

    timeit("take + 3-shear bmm(51) + scatter",
           jax.jit(rot_subset_bmm), [(im,) for im in imgs])


if __name__ == "__main__":
    main()
