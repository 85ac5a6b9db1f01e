"""Dev-only: attention kernel A/B round 3 — amortizing per-grid-step cost.

Round 2 verdict (clean, first-variant harness artifact excluded):
floor2 (matmuls only) 14.2 ms vs fused (full softmax) ~14.8 ms at
B=256 H=8 T=784 D=32 — the softmax VPU passes are nearly free; the
kernel is bound by the 2048 tiny grid steps (~7 us/step against ~3 us
of ideal MXU work). fastexp/expbf16 are dead (native exp wins).

This round batches G (b,h) cells per grid step as BATCHED dot_generals
(no in-kernel Python indexing — the unrolled q_ref[g] form crashes the
remote Mosaic compiler with an opaque HTTP 500):

  fused   - shipped kernel, grid (B,H) — baseline (measure 2nd!)
  dgbN    - (G,T,D) blocks over a (B*H,T,D) reshape, batched dot_general
            QK^T / AV, full softmax, grid B*H/G
  dgbf8   - dgb8 without softmax (the new floor)

CAUTION: first measured variant reads ~70 ms too high (tunnel warm-up);
a throwaway 'warm' variant runs first. Do not run while tests/ runs.

Run ON TPU: python tools_dev/attn_kernel_ab3.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

B = int(os.environ.get("AB_BATCH", "256"))
H, T, D = 8, 784, 32
ITERS = int(os.environ.get("AB_ITERS", "10"))


def _bmm(a, b, dims):
    # batched over leading axis: a (G, M, K'), b (G, N, K') etc.
    return jax.lax.dot_general(
        a, b, (dims, ((0,), (0,))), preferred_element_type=jnp.float32)


def k_fused(q_ref, k_ref, v_ref, o_ref):
    q, k, v = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    o = jax.lax.dot_general(e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0, 0] = (o / l).astype(o_ref.dtype)


def k_dgb(q_ref, k_ref, v_ref, o_ref):
    q, k, v = q_ref[...], k_ref[...], v_ref[...]
    s = _bmm(q, k, ((2,), (2,)))  # (G, T, T) f32
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    o = _bmm(e.astype(v.dtype), v, ((2,), (1,)))  # (G, T, D)
    o_ref[...] = (o / l).astype(o_ref.dtype)


def k_dgbf(q_ref, k_ref, v_ref, o_ref):
    q, k, v = q_ref[...], k_ref[...], v_ref[...]
    s = _bmm(q, k, ((2,), (2,)))
    o = _bmm(s.astype(v.dtype), v, ((2,), (1,)))
    o_ref[...] = o.astype(o_ref.dtype)


def build(name):
    sm = 1.0 / np.sqrt(D)

    if name.startswith("dgb"):
        kern = k_dgbf if name.startswith("dgbf") else k_dgb
        G = int(name.replace("dgbf", "").replace("dgb", ""))
        spec3 = pl.BlockSpec((G, T, D), lambda i: (i, 0, 0))

        def f(q, k, v):
            qs = (q.astype(jnp.float32) * sm).astype(q.dtype)
            qs, kf, vf = (t.reshape(B * H, T, D) for t in (qs, k, v))
            out = pl.pallas_call(
                kern, grid=(B * H // G,),
                in_specs=[spec3] * 3, out_specs=spec3,
                out_shape=jax.ShapeDtypeStruct((B * H, T, D), q.dtype),
            )(qs, kf, vf)
            return out.reshape(B, H, T, D)
        return f

    spec = pl.BlockSpec((1, 1, T, D), lambda b, h: (b, h, 0, 0))

    def f(q, k, v):
        qs = (q.astype(jnp.float32) * sm).astype(q.dtype)
        return pl.pallas_call(
            k_fused, grid=(B, H), in_specs=[spec] * 3, out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
        )(qs, k, v)
    return f


def main():
    rng = np.random.RandomState(0)
    pool = [
        tuple(jnp.asarray(rng.randn(B, H, T, D), jnp.bfloat16)
              for _ in range(3))
        for _ in range(3)
    ]
    base_fn = jax.jit(build("fused"))
    base_out = np.asarray(base_fn(*pool[0]), np.float32)
    denom = np.abs(base_out).mean()

    for name in ["warm", "fused", "dgb2", "dgb4", "dgb8", "dgb16", "dgbf8"]:
        try:
            fn = base_fn if name == "warm" else jax.jit(build(name))
            out = fn(*pool[0])
            err = float(np.abs(np.asarray(out, np.float32) - base_out).max()
                        / denom)
            acc = jnp.sum(out.astype(jnp.float32))
            float(acc)
            t0 = time.perf_counter()
            acc = jnp.float32(0.0)
            for i in range(ITERS):
                acc = acc + jnp.sum(fn(*pool[i % len(pool)]
                                       ).astype(jnp.float32))
            _ = float(acc)
            dt = (time.perf_counter() - t0) / ITERS
            print(f"{name:8s} {dt*1e3:8.2f} ms/iter   rel-vs-fused={err:.2e}",
                  flush=True)
        except Exception as exc:
            print(f"{name:8s} SKIP: {type(exc).__name__}: "
                  f"{str(exc)[:160]}", flush=True)


if __name__ == "__main__":
    main()
