"""Dev-only: final round-4 backward probes.

(1) In-stack fused-Pallas vs XLA-einsum encoder attention core for the
    TRAIN grad — done properly this time: bwd_dissect2.py's class-attribute
    patch didn't survive flax's dataclass field defaults, so both arms ran
    fused. Here a subclass with impl="xla" replaces tr._Attention (the
    EncoderLayer resolves the module global at call time).
(2) grad with aux_loss off (isolates the 4-level aux criterion cost).

    BD_BATCH=128 python tools_dev/bwd_dissect4.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

B = int(os.environ.get("BD_BATCH", "128"))
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


def time_transformer(label):
    from satellite_pose_estimation_tpu.models import transformer as tr

    rng = np.random.RandomState(0)
    n_pool = max(4, ITERS)
    srcs = [jnp.asarray(rng.rand(B, 28, 28, 256), jnp.bfloat16)
            for _ in range(n_pool)]
    pos = jnp.asarray(rng.rand(28, 28, 256), jnp.bfloat16)
    qe = jnp.asarray(rng.rand(20, 256), jnp.bfloat16)

    model = tr.Transformer(
        d_model=256, nhead=8, num_encoder_layers=4, num_decoder_layers=4,
        dim_feedforward=2048, dropout=0.0, dtype=jnp.bfloat16)
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


def main():
    from satellite_pose_estimation_tpu.models import transformer as tr

    time_transformer("transformer 4e4d FUSED attn")

    class _XlaAttention(tr._Attention):
        impl: str = "xla"

    orig = tr._Attention
    tr._Attention = _XlaAttention
    try:
        time_transformer("transformer 4e4d XLA attn (bf16 scores)")
    finally:
        tr._Attention = orig

    class _FlashAttention(tr._Attention):
        impl: str = "flash"

    tr._Attention = _FlashAttention
    try:
        time_transformer("transformer 4e4d FLASH attn")
    finally:
        tr._Attention = orig


if __name__ == "__main__":
    main()
