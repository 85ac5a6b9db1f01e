"""Dev-only: stage-level timing breakdown of the flagship forward on TPU.

Methodology per CLAUDE.md: pool of distinct inputs, chain dispatches,
block on all outputs at the end. Prints ms/iter and img/s per stage.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

B = int(os.environ.get("BB_BATCH", "256"))
ITERS = int(os.environ.get("BB_ITERS", "10"))
STAGES = os.environ.get("BB_STAGES", "").split(",") if os.environ.get("BB_STAGES") else None


def timeit(name, fn, pool):
    # warmup/compile
    out = fn(pool[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(pool[i % len(pool)]) for i in range(ITERS)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:36s} {dt*1e3:9.2f} ms/iter  {B/dt:9.0f} img/s", flush=True)
    return dt


def main():
    from satellite_pose_estimation_tpu.models.detr import DETRConfig, DETRKeypointModel
    from satellite_pose_estimation_tpu.models.resnet import Backbone8s
    from satellite_pose_estimation_tpu.models.transformer import (
        EncoderLayer, DecoderLayer, Transformer)
    from flax import linen as nn

    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    def pool_of(shape, n=4, dtype=jnp.bfloat16):
        return [jnp.asarray(rng.randn(*shape), dtype) for _ in range(n)]

    def want(name):
        return STAGES is None or name in STAGES

    # --- full model forward
    if want("full"):
        cfg = DETRConfig(backbone="resnet50s8", enc_layers=4, dec_layers=4,
                         num_queries=20, dropout=0.0, dtype=dt)
        model = DETRKeypointModel(cfg)
        variables = model.init(key, jnp.zeros((2, 224, 224, 3)), train=False)
        f = jax.jit(lambda v, x: model.apply(v, x, train=False))
        xs = pool_of((B, 224, 224, 3), 4, jnp.float32)
        timeit("full model fwd @224", lambda x: f(variables, x), xs)

    # --- backbone only
    if want("backbone"):
        bb = Backbone8s(dtype=dt)
        vb = bb.init(key, jnp.zeros((2, 224, 224, 3)), train=False)
        fb = jax.jit(lambda v, x: bb.apply(v, x, train=False))
        xs = pool_of((B, 224, 224, 3), 4, jnp.float32)
        timeit("Backbone8s fwd @224", lambda x: fb(vb, x), xs)

    # --- single encoder layer (T=784, d=256, ffn=2048)
    if want("enc"):
        enc = EncoderLayer(256, 8, 2048, 0.0, "relu", False, dt)
        src = jnp.zeros((B, 784, 256), dt)
        pos = jnp.zeros((1, 784, 256), dt)
        ve = enc.init(key, src, pos, True)
        fe = jax.jit(lambda v, s, p: enc.apply(v, s, p, True))
        srcs = pool_of((B, 784, 256))
        timeit("1 encoder layer (T784 d256)", lambda s: fe(ve, s, pos), srcs)

    # --- attention core only (flax MHA, q=k=v)
    if want("attn"):
        mha = nn.MultiHeadDotProductAttention(num_heads=8, qkv_features=256,
                                              out_features=256, dtype=dt)
        x0 = jnp.zeros((B, 784, 256), dt)
        vm = mha.init(key, x0, x0, x0)
        fm = jax.jit(lambda v, x: mha.apply(v, x, x, x))
        xs = pool_of((B, 784, 256))
        timeit("MHA core (T784 h8 d32)", lambda x: fm(vm, x), xs)

    # --- FFN only
    if want("ffn"):
        class FFN(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.Dense(2048, dtype=dt)(x)
                x = nn.relu(x)
                return nn.Dense(256, dtype=dt)(x)
        ffn = FFN()
        vf = ffn.init(key, jnp.zeros((B, 784, 256), dt))
        ff = jax.jit(lambda v, x: ffn.apply(v, x))
        xs = pool_of((B, 784, 256))
        timeit("FFN (256->2048->256)", lambda x: ff(vf, x), xs)

    # --- decoder stack (4 layers, 20 queries)
    if want("dec"):
        tr = Transformer(256, 8, 0, 4, 2048, 0.0, "relu", False, dt)
        src = jnp.zeros((B, 28, 28, 256), dt)
        qe = jnp.zeros((20, 256), dt)
        pe = jnp.zeros((28, 28, 256), dt)
        vt = tr.init(key, src, qe, pe, True)
        ft = jax.jit(lambda v, s: tr.apply(v, s, qe, pe, True))
        srcs = pool_of((B, 28, 28, 256))
        timeit("decoder stack (enc0 dec4 q20)", lambda s: ft(vt, s), srcs)

    # --- raw matmul ceiling probe: same FLOPs as one FFN pass
    if want("matmul"):
        w1 = jnp.asarray(rng.randn(256, 2048), dt)
        w2 = jnp.asarray(rng.randn(2048, 256), dt)
        fmm = jax.jit(lambda x: jnp.maximum(x @ w1, 0) @ w2)
        xs = pool_of((B * 784, 256))
        timeit("raw matmul pair (BT,256)x(256,2048)", fmm, xs)

    print("done", flush=True)


if __name__ == "__main__":
    main()
