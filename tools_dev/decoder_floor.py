"""Dev-only: numeric floor for the RT-DETR decoder stage (VERDICT r4 item 8).

The decoder measured 54.8 ms of the 95.3 ms eval step @256 B=256 (PERF.md
round 4) at trivial FLOPs, and was twice declared "architecture, not
scheduling" without a number. This dissects the stage into its sub-ops and
puts a memory-traffic + dispatch lower bound next to each:

  input_proj (3x 1x1 conv+BN)  | enc head (dense+LN+score+bbox MLP)
  top_k + gathers              | per-layer: self-attn (Q=30) |
  deform-attn value_proj       | offsets/attw linears |
  matmul sampling core         | FFN + heads

Methodology per CLAUDE.md: pool of distinct inputs, chained dispatches,
one host sync at the end. Env: DF_BATCH (256), DF_ITERS (10), DF_INPUT
(256).

Traffic model printed at the end: bytes touched per sub-op at bf16 (HBM
read+write), divided by the practical v5e bandwidth envelope (550-800
GB/s) -> ms floor; plus ~3.2 ms per standalone dispatch (tunnel).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

B = int(os.environ.get("DF_BATCH", "256"))
ITERS = int(os.environ.get("DF_ITERS", "10"))
INPUT = int(os.environ.get("DF_INPUT", "256"))


def _scalarize(out):
    leaves = jax.tree_util.tree_leaves(out)
    return sum(jnp.sum(jnp.asarray(l, jnp.float32)) for l in leaves[:2])


def timeit(name, fn, pool):
    acc = _scalarize(fn(pool[0])) + _scalarize(fn(pool[1 % len(pool)]))
    float(acc)
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for i in range(ITERS):
        acc = acc + _scalarize(fn(pool[i % len(pool)]))
    _ = float(acc)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:44s} {dt*1e3:9.2f} ms/iter", flush=True)
    return dt


def main():
    from satellite_pose_estimation_tpu.models.rtdetr_decoder import (
        MSDeformableAttention,
        RTDecoderLayer,
        RTDETRTransformer,
    )
    from satellite_pose_estimation_tpu.ops.deform_attn import (
        deformable_attention_core_matmul,
    )

    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    s8 = INPUT // 8
    shapes = [(s8, s8), (s8 // 2, s8 // 2), (s8 // 4, s8 // 4)]
    L = sum(h * w for h, w in shapes)
    C, H, Q, P = 256, 8, 30, 4

    def pool_feats(n=4):
        out = []
        for _ in range(n):
            out.append([jnp.asarray(rng.randn(B, h, w, C), dt)
                        for (h, w) in shapes])
        return out

    def pool_of(shape, n=4, dtype=dt):
        return [jnp.asarray(rng.randn(*shape), dtype) for _ in range(n)]

    # --- full decoder
    dec = RTDETRTransformer(num_classes=11, dtype=dt)
    v = dec.init(key, [jnp.zeros((2, h, w, C), dt) for h, w in shapes])
    t_full = timeit("decoder FULL", jax.jit(
        lambda xs: dec.apply(v, xs, train=False)), pool_feats())

    # --- truncated variants: per-layer cost by differencing 1 vs 3
    # layers; head cost (proj + enc head + topk) by extrapolating to 0.
    dec1 = RTDETRTransformer(num_classes=11, num_decoder_layers=1, dtype=dt)
    v1 = dec1.init(key, [jnp.zeros((2, h, w, C), dt) for h, w in shapes])
    t_1l = timeit("decoder layers=1", jax.jit(
        lambda xs: dec1.apply(v1, xs, train=False)), pool_feats())
    per_layer = (t_full - t_1l) / 2
    t_head = t_1l - per_layer

    # --- single decoder layer standalone
    layer = RTDecoderLayer(C, H, 1024, 0.0, "relu", 3, P, dt)
    tgt0 = jnp.zeros((2, Q, C), dt)
    mem0 = jnp.zeros((2, L, C), dt)
    refp0 = jnp.full((2, Q, 2), 0.5, jnp.float32)
    vl = layer.init(key, tgt0, refp0, mem0, shapes, tgt0)
    lpool = [(jnp.asarray(rng.randn(B, Q, C), dt),
              jnp.asarray(rng.rand(B, Q, 2), jnp.float32),
              jnp.asarray(rng.randn(B, L, C), dt),
              jnp.asarray(rng.randn(B, Q, C), dt)) for _ in range(4)]
    timeit("one RTDecoderLayer", jax.jit(
        lambda t: layer.apply(vl, t[0], t[1], t[2], shapes, t[3])), lpool)

    # --- deform attention standalone
    msda = MSDeformableAttention(C, H, 3, P, dt)
    vm = msda.init(key, tgt0, refp0, mem0, shapes)
    timeit("MSDeformableAttention", jax.jit(
        lambda t: msda.apply(vm, t[0], t[1], t[2], shapes)),
        [(p[0], p[1], p[2]) for p in lpool])

    # --- the matmul sampling core alone
    cpool = [(jnp.asarray(rng.randn(B, L, H, C // H), dt),
              jnp.asarray(rng.rand(B, Q, H, 3, P, 2), jnp.float32),
              jnp.asarray(rng.rand(B, Q, H, 3, P), dt)) for _ in range(4)]
    timeit("matmul sampling core", jax.jit(
        lambda t: deformable_attention_core_matmul(t[0], shapes, t[1], t[2])),
        cpool)

    # --- value_proj-equivalent dense over the memory
    import flax.linen as nn

    dense = nn.Dense(C, dtype=dt)
    vd = dense.init(key, mem0)
    timeit("value_proj dense (B,L,C)@(C,C)", jax.jit(
        lambda x: dense.apply(vd, x)), pool_of((B, L, C)))

    # --- top_k over (B, L) + take_along_axis of (B, L, C): lax.top_k
    # (bitonic sort) vs the sort-free small-K selection (ops/topk.py)
    from satellite_pose_estimation_tpu.ops.topk import topk_small_k

    def topk_sel(t):
        scores, arr = t
        _, ind = jax.lax.top_k(scores, Q)
        return jnp.take_along_axis(
            arr, ind[..., None].repeat(arr.shape[-1], -1), axis=1)

    def topk_sel_small(t):
        scores, arr = t
        _, ind = topk_small_k(scores, Q)
        return jnp.take_along_axis(
            arr, ind[..., None].repeat(arr.shape[-1], -1), axis=1)

    from satellite_pose_estimation_tpu.ops.topk import select_rows

    def topk_sel_matmul(t):
        scores, arr = t
        _, ind = topk_small_k(scores, Q)
        return select_rows(arr, ind)

    tpool = [(jnp.asarray(rng.randn(B, L), dt),
              jnp.asarray(rng.randn(B, L, C), dt)) for _ in range(4)]
    timeit("lax.top_k(Q)+gather (B,L,C)", jax.jit(topk_sel), tpool)
    timeit("topk_small_k(Q)+gather (B,L,C)", jax.jit(topk_sel_small), tpool)
    timeit("topk_small_k(Q)+select_rows matmul", jax.jit(topk_sel_matmul),
           tpool)

    def topk_only(t):
        scores, _ = t
        return jax.lax.top_k(scores, Q)[1]

    def topk_small_only(t):
        scores, _ = t
        return topk_small_k(scores, Q)[1]

    timeit("lax.top_k alone (B,L)", jax.jit(topk_only), tpool)
    timeit("topk_small_k alone (B,L)", jax.jit(topk_small_only), tpool)

    # --- self-attn-sized matmul chain (Q=30: dispatch-bound tiny ops)
    timeit("Q=30 dense chain x4 (self-attn scale)", jax.jit(
        lambda x: jnp.tanh(x @ jnp.ones((C, C), dt)
                           @ jnp.ones((C, C), dt)
                           @ jnp.ones((C, C), dt)
                           @ jnp.ones((C, C), dt))),
        pool_of((B, Q, C)))

    # ---------------- traffic floors ----------------
    bf = 2  # bytes bf16
    mem_bytes = B * L * C * bf
    core_w2d = sum(B * Q * H * P * h * w for h, w in shapes) * bf
    sampled = B * H * Q * 3 * P * (C // H) * bf
    print("\n--- bf16 traffic model (read+write, GB) ---")
    rows = {
        "memory tensor (B,L,C) one read": mem_bytes / 1e9,
        "value_proj: read+write memory": 2 * mem_bytes / 1e9,
        "w2d per layer (write+read)": 2 * core_w2d / 1e9,
        "sampled stack per layer": 2 * sampled / 1e9,
        "3 layers w2d total": 6 * core_w2d / 1e9,
    }
    for k, val in rows.items():
        # val GB / (GB/ms): 800 GB/s = 0.8 GB/ms
        print(f"{k:44s} {val:8.3f} GB  -> {val/0.8:6.2f}..."
              f"{val/0.55:6.2f} ms @ 800...550 GB/s")
    print(f"\nlayers-by-differencing: full {t_full*1e3:.2f} ms, "
          f"1-layer {t_1l*1e3:.2f} ms -> per-layer {per_layer*1e3:.2f} ms, "
          f"head (proj+enc+topk, extrapolated) {t_head*1e3:.2f} ms")


if __name__ == "__main__":
    main()
