"""Dev-only: attention kernel A/B round 2 — plain (T, D) V layout only.

Round 1 (attn_kernel_ab.py) verdict: every variant carrying a (T, D+1)
ones-column V block LOST to the shipped kernel — Mosaic's handling of the
33-lane block costs more than a separate row-sum pass (even the
matmul-only floor was slower than the full fused kernel: 16.2 vs
14.8 ms). This round isolates the softmax pass costs with the production
(T, 32) layout untouched:

  fused    - shipped kernel (max, exp, sum, fold-div) — baseline
  floor2   - matmuls only (no softmax at all): the MXU floor
  maxonly  - matmuls + the row-max pass + subtract/cast
  fastexp2 - shipped structure, jnp.exp replaced by the poly-bitcast exp
  expbf16  - shipped structure, exp computed in bf16 (f32 sum accum)
  gbatchN  - N (b,h) cells per grid step over a (B*H, T, D) reshape
             (statically unrolled): prices per-grid-step overhead.
             (A (1, H, T, D)-block 4-D-indexing form of this crashed the
             remote Mosaic compiler in round 1; the 3-D reshape avoids it.)

CAUTION: do not run while tests/ is running — the suite's subprocesses
initialize the axon tunnel and pollute timings (fused measured 88 ms vs
14.8 clean in one such run). The FIRST timed variant additionally reads
~70 ms too high (tunnel warm-up artifact); the 'warm' throwaway run
absorbs it. The error column is max|abs diff|/mean|ref|, not an
elementwise relative error.

Run ON TPU: python tools_dev/attn_kernel_ab2.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from tools_dev.attn_kernel_ab import fast_exp_f32

B = int(os.environ.get("AB_BATCH", "256"))
H, T, D = 8, 784, 32
ITERS = int(os.environ.get("AB_ITERS", "10"))


def _mm(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def k_fused(q_ref, k_ref, v_ref, o_ref):
    q, k, v = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0]
    s = _mm(q, k, ((1,), (1,)))
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    o = _mm(e.astype(v.dtype), v, ((1,), (0,)))
    o_ref[0, 0] = (o / l).astype(o_ref.dtype)


def k_floor2(q_ref, k_ref, v_ref, o_ref):
    q, k, v = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0]
    s = _mm(q, k, ((1,), (1,)))
    o = _mm(s.astype(v.dtype), v, ((1,), (0,)))
    o_ref[0, 0] = o.astype(o_ref.dtype)


def k_maxonly(q_ref, k_ref, v_ref, o_ref):
    q, k, v = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0]
    s = _mm(q, k, ((1,), (1,)))
    m = jnp.max(s, axis=-1, keepdims=True)
    o = _mm((s - m).astype(v.dtype), v, ((1,), (0,)))
    o_ref[0, 0] = o.astype(o_ref.dtype)


def k_fastexp2(q_ref, k_ref, v_ref, o_ref):
    q, k, v = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0]
    s = _mm(q, k, ((1,), (1,)))
    m = jnp.max(s, axis=-1, keepdims=True)
    e = fast_exp_f32(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    o = _mm(e.astype(v.dtype), v, ((1,), (0,)))
    o_ref[0, 0] = (o / l).astype(o_ref.dtype)


def k_expbf16(q_ref, k_ref, v_ref, o_ref):
    q, k, v = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0]
    s = _mm(q, k, ((1,), (1,)))
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp((s - m).astype(jnp.bfloat16))
    l = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
    o = _mm(e.astype(v.dtype), v, ((1,), (0,)))
    o_ref[0, 0] = (o / l).astype(o_ref.dtype)


def make_gbatch(G):
    def k_gbatch(q_ref, k_ref, v_ref, o_ref):
        for g in range(G):
            q, k, v = q_ref[g], k_ref[g], v_ref[g]
            s = _mm(q, k, ((1,), (1,)))
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            l = jnp.sum(e, axis=-1, keepdims=True)
            o = _mm(e.astype(v.dtype), v, ((1,), (0,)))
            o_ref[g] = (o / l).astype(o_ref.dtype)
    return k_gbatch


KERNELS = {"fused": k_fused, "floor2": k_floor2, "maxonly": k_maxonly,
           "fastexp2": k_fastexp2, "expbf16": k_expbf16}
RUN_ORDER = ["warm", "fused", "floor2", "maxonly", "fastexp2", "expbf16",
             "gbatch4", "gbatch8", "gbatch16"]


def build(name):
    sm = 1.0 / np.sqrt(D)

    if name.startswith("gbatch"):
        G = int(name[len("gbatch"):])
        spec3 = pl.BlockSpec((G, T, D), lambda i: (i, 0, 0))

        def f(q, k, v):
            qs = (q.astype(jnp.float32) * sm).astype(q.dtype)
            qs, kf, vf = (t.reshape(B * H, T, D) for t in (qs, k, v))
            out = pl.pallas_call(
                make_gbatch(G), grid=(B * H // G,),
                in_specs=[spec3] * 3, out_specs=spec3,
                out_shape=jax.ShapeDtypeStruct((B * H, T, D), q.dtype),
            )(qs, kf, vf)
            return out.reshape(B, H, T, D)
        return f

    spec = pl.BlockSpec((1, 1, T, D), lambda b, h: (b, h, 0, 0))

    def f(q, k, v):
        qs = (q.astype(jnp.float32) * sm).astype(q.dtype)
        return pl.pallas_call(
            KERNELS[name], grid=(B, H), in_specs=[spec] * 3, out_specs=spec,
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

    for name in RUN_ORDER:
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
            print(f"{name:10s} {dt*1e3:8.2f} ms/iter   rel-vs-fused={err:.2e}",
                  flush=True)
        except Exception as exc:
            print(f"{name:10s} SKIP: {type(exc).__name__}: "
                  f"{str(exc)[:200]}", flush=True)


if __name__ == "__main__":
    main()
