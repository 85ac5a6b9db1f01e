"""Dev-only: defeat XLA's VMEM output-pinning of the bwd attention dq.

At B=8 T=4096 the (bf16 dq, f32 dk, f32 dv) tuple gets its first element
placed in VMEM (S(1)) — 16.78M output + 5.23M kernel scoped = 22.01M >
16M scoped limit, a compile-time hard fail, independent of strip height
and of output_to_operand_aliasing. Variants probed on the real chip:
  a: dq emitted f32, sm_scale folded into the kernel
  b: output order (dk, dv, dq) — is it "first output" that gets pinned?
  c: rows=128 control (scoped 2.6M; still fails if pinning persists)

Run: python tools_dev/attn4096_pin_ab.py a b c
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from satellite_pose_estimation_tpu.ops import fused_attention as fa

B, H, T, D = 8, 8, 4096, 32


def kernel_a(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *, scale):
    i = pl.program_id(2)
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    g = g_ref[0, 0]
    mm = lambda a, b, dims: jax.lax.dot_general(
        a, b, (dims, ((), ())), preferred_element_type=jnp.float32
    )
    s = mm(q, k, ((1,), (1,)))
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    p = e / l
    pb = p.astype(v.dtype)
    dv_part = mm(pb, g, ((0,), (0,)))
    dp = mm(g, v, ((1,), (1,)))
    ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
    dsb = ds.astype(q.dtype)
    dq_ref[0, 0] = mm(dsb, k, ((1,), (0,))) * scale  # f32 out, scale folded
    dk_part = mm(dsb, q, ((0,), (0,)))

    @pl.when(i == 0)
    def _():
        dk_ref[0, 0] = dk_part
        dv_ref[0, 0] = dv_part

    @pl.when(i > 0)
    def _():
        dk_ref[0, 0] += dk_part
        dv_ref[0, 0] += dv_part


def kernel_b(q_ref, k_ref, v_ref, g_ref, dk_ref, dv_ref, dq_ref):
    i = pl.program_id(2)
    fa._attn_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref)


def run(variant: str, rows: int = 256):
    from functools import partial

    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(keys[0], (B, H, T, D), jnp.bfloat16)
    k = jax.random.normal(keys[1], (B, H, T, D), jnp.bfloat16)
    v = jax.random.normal(keys[2], (B, H, T, D), jnp.bfloat16)
    g = jax.random.normal(keys[3], (B, H, T, D), jnp.bfloat16)
    sm = 1.0 / np.sqrt(D)

    qspec = pl.BlockSpec((1, 1, rows, D), lambda b, h, i: (b, h, i, 0))
    kvspec = pl.BlockSpec((1, 1, T, D), lambda b, h, i: (b, h, 0, 0))
    f32 = jnp.float32
    shp = lambda dt: jax.ShapeDtypeStruct((B, H, T, D), dt)

    if variant == "a":
        call = pl.pallas_call(
            partial(kernel_a, scale=sm),
            grid=(B, H, T // rows),
            in_specs=[qspec, kvspec, kvspec, qspec],
            out_specs=[qspec, kvspec, kvspec],
            out_shape=[shp(f32), shp(f32), shp(f32)],
        )
        fn = jax.jit(lambda q, k, v, g: call(
            (q.astype(f32) * sm).astype(q.dtype), k, v, g))
    elif variant == "b":
        call = pl.pallas_call(
            kernel_b,
            grid=(B, H, T // rows),
            in_specs=[qspec, kvspec, kvspec, qspec],
            out_specs=[kvspec, kvspec, qspec],
            out_shape=[shp(f32), shp(f32), shp(jnp.bfloat16)],
        )
        fn = jax.jit(lambda q, k, v, g: call(
            (q.astype(f32) * sm).astype(q.dtype), k, v, g))
    else:  # c: shipped kernel, rows=128
        rows = 128
        qspec = pl.BlockSpec((1, 1, rows, D), lambda b, h, i: (b, h, i, 0))
        call = pl.pallas_call(
            fa._attn_bwd_kernel,
            grid=(B, H, T // rows),
            in_specs=[qspec, kvspec, kvspec, qspec],
            out_specs=[qspec, kvspec, kvspec],
            out_shape=[shp(jnp.bfloat16), shp(f32), shp(f32)],
        )
        fn = jax.jit(lambda q, k, v, g: call(
            (q.astype(f32) * sm).astype(q.dtype), k, v, g))

    try:
        out = fn(q, k, v, g)
        s = float(jnp.sum(out[0].astype(f32)))
        print(f"{variant}: OK sum={s:.3f}", flush=True)
    except Exception as e:
        line = [x for x in str(e).split("\n") if "Scoped" in x or "INTERNAL" in x]
        print(f"{variant}: FAIL {line[:1]}", flush=True)


if __name__ == "__main__":
    for v in sys.argv[1:] or ["a", "b", "c"]:
        run(v)
