"""Dev-only: encoder-attention kernel variant A/B on real TPU.

PERF.md breakdown: encoder MHA core is ~12.8 ms/layer real at
B=256 H=8 T=784 D=32 (~51 ms of the ~100 ms forward) and is NOT matmul
bound: QK^T at D=32 contraction is ~2.9 ms effective (25% MXU lane
util), AV ~2.9 ms (N=32 of 128 output lanes), so ~6-7 ms/layer is
softmax VPU passes (max, exp, sum) over the (784,784) f32 score block.

Variants measured here (all VMEM-resident scores, grid (B,H)):
  xla      - plain XLA f32-softmax attention (production fallback path)
  fused    - ops/fused_attention.py as shipped (max, exp, sum, fold-div)
  onesum   - row-sum folded into the AV matmul via a ones column in V
             (AV output widens 32->33 lanes: free, same MXU tile)
  fastexp  - onesum + polynomial 2^f * 2^i exp (int32 exponent-assembly
             bitcast; Mosaic's native exp2 measured 3x slower, this
             builds the scale manually and keeps the poly on the VPU)
  nomax    - fastexp without the row-max pass (clamped arg; UNSAFE in
             general - measured only to price the max pass)
  floor    - matmuls only, exp elided (the kernel's arithmetic floor)
  hbatch   - all 8 heads per grid step (prices per-step overhead)

Prints ms/iter per variant plus max|abs diff|/mean|ref| vs the f32 XLA
reference (a normalized max-abs metric, not elementwise relative error).
CAUTION (learned post-hoc, see ab3/ab4): the FIRST timed variant reads
~70 ms/iter too high on the remote tunnel — the 'warm' throwaway added
below absorbs it. Do not run while tests/ is running (suite subprocesses
touch the tunnel and pollute timings).
Run ON TPU (each variant is a fresh ~minutes tunnel compile; expect
~15-25 min wall): python tools_dev/attn_kernel_ab.py
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

B = int(os.environ.get("AB_BATCH", "256"))
H, T, D = 8, 784, 32
ITERS = int(os.environ.get("AB_ITERS", "10"))
ONLY = os.environ.get("AB_ONLY", "").split(",") if os.environ.get("AB_ONLY") else None

LOG2E = 1.4426950408889634
# Degree-4 fit of 2^f on [0,1): max abs err ~1e-6 -- far below bf16 eps.
_f = np.linspace(0.0, 1.0, 4097)
C4, C3, C2, C1, C0 = np.polyfit(_f, np.exp2(_f), 4)


def fast_exp_f32(x):
    """e^x for f32 x <= ~0 (post max-subtraction): poly 2^f times 2^i
    with the integer scale assembled by int32 bitcast (Mosaic-safe)."""
    y = jnp.maximum(x * LOG2E, -120.0)
    yi = jnp.floor(y)
    f = y - yi
    p = C0 + f * (C1 + f * (C2 + f * (C3 + f * C4)))
    ei = (yi.astype(jnp.int32) + 127) * 8388608  # << 23
    return p * jax.lax.bitcast_convert_type(ei, jnp.float32)


def _mm(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


# --- kernels ---------------------------------------------------------------

def k_fused(q_ref, k_ref, v_ref, o_ref):
    q, k, v = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0]
    s = _mm(q, k, ((1,), (1,)))
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    o = _mm(e.astype(v.dtype), v, ((1,), (0,)))
    o_ref[0, 0] = (o / l).astype(o_ref.dtype)


def k_onesum(q_ref, k_ref, v_ref, o_ref):
    # v_ref block is (1, 1, T, D+1): real V in [:, :D], ones at [:, D].
    q, k, v = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0]
    s = _mm(q, k, ((1,), (1,)))
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    o = _mm(e.astype(v.dtype), v, ((1,), (0,)))  # (T, D+1); col D = rowsum
    o_ref[0, 0] = (o[:, :D] / o[:, D:D + 1]).astype(o_ref.dtype)


def k_fastexp(q_ref, k_ref, v_ref, o_ref):
    q, k, v = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0]
    s = _mm(q, k, ((1,), (1,)))
    m = jnp.max(s, axis=-1, keepdims=True)
    e = fast_exp_f32(s - m)
    o = _mm(e.astype(v.dtype), v, ((1,), (0,)))
    o_ref[0, 0] = (o[:, :D] / o[:, D:D + 1]).astype(o_ref.dtype)


def k_nomax(q_ref, k_ref, v_ref, o_ref):
    q, k, v = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0]
    s = _mm(q, k, ((1,), (1,)))
    e = fast_exp_f32(jnp.minimum(s, 60.0) - 60.0)
    o = _mm(e.astype(v.dtype), v, ((1,), (0,)))
    o_ref[0, 0] = (o[:, :D] / o[:, D:D + 1]).astype(o_ref.dtype)


def k_floor(q_ref, k_ref, v_ref, o_ref):
    q, k, v = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0]
    s = _mm(q, k, ((1,), (1,)))
    o = _mm(s.astype(v.dtype), v, ((1,), (0,)))
    o_ref[0, 0] = (o[:, :D] / (o[:, D:D + 1] + 1.0)).astype(o_ref.dtype)


def k_hbatch(q_ref, k_ref, v_ref, o_ref):
    for h in range(H):
        q, k, v = q_ref[0, h], k_ref[0, h], v_ref[0, h]
        s = _mm(q, k, ((1,), (1,)))
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=-1, keepdims=True)
        o = _mm(e.astype(v.dtype), v, ((1,), (0,)))
        o_ref[0, h] = (o / l).astype(o_ref.dtype)


def build(name):
    """Returns fn(q, k, v) -> (B,H,T,D) bf16; q arrives UNSCALED."""
    sm = 1.0 / np.sqrt(D)

    def scale(q):
        return (q.astype(jnp.float32) * sm).astype(q.dtype)

    if name == "xla":
        def f(q, k, v):
            s = jnp.einsum("bhqd,bhkd->bhqk", scale(q), k,
                           preferred_element_type=jnp.float32)
            p = jax.nn.softmax(s, axis=-1)
            return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                              preferred_element_type=jnp.float32
                              ).astype(q.dtype)
        return f

    spec = pl.BlockSpec((1, 1, T, D), lambda b, h: (b, h, 0, 0))
    vspec1 = pl.BlockSpec((1, 1, T, D + 1), lambda b, h: (b, h, 0, 0))
    hspec = pl.BlockSpec((1, H, T, D), lambda b: (b, 0, 0, 0))

    def ext(v):  # append the ones column
        return jnp.concatenate(
            [v, jnp.ones((B, H, T, 1), v.dtype)], axis=-1)

    if name == "fused":
        def f(q, k, v):
            return pl.pallas_call(
                k_fused, grid=(B, H), in_specs=[spec] * 3, out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
            )(scale(q), k, v)
        return f
    if name in ("onesum", "fastexp", "nomax", "floor"):
        kern = {"onesum": k_onesum, "fastexp": k_fastexp,
                "nomax": k_nomax, "floor": k_floor}[name]
        def f(q, k, v):
            return pl.pallas_call(
                kern, grid=(B, H), in_specs=[spec, spec, vspec1],
                out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
            )(scale(q), k, ext(v))
        return f
    if name == "hbatch":
        def f(q, k, v):
            return pl.pallas_call(
                k_hbatch, grid=(B,), in_specs=[hspec] * 3, out_specs=hspec,
                out_shape=jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
            )(scale(q), k, v)
        return f
    raise ValueError(name)


def main():
    rng = np.random.RandomState(0)
    pool = [
        tuple(jnp.asarray(rng.randn(B, H, T, D), jnp.bfloat16)
              for _ in range(3))
        for _ in range(3)
    ]
    ref_fn = jax.jit(build("xla"))
    ref_out = np.asarray(ref_fn(*pool[0]), np.float32)
    denom = np.abs(ref_out).mean()

    names = ["warm", "xla", "fused", "onesum", "fastexp", "nomax", "floor",
             "hbatch"]
    if ONLY:
        names = [n for n in names if n in ONLY]
    for name in names:
        try:
            fn = ref_fn if name == "warm" else jax.jit(build(name))
            out = fn(*pool[0])
            err = float(np.abs(np.asarray(out, np.float32) - ref_out).max()
                        / denom)
            acc = jnp.sum(out.astype(jnp.float32))
            float(acc)  # sync after compile+warmup
            t0 = time.perf_counter()
            acc = jnp.float32(0.0)
            for i in range(ITERS):
                acc = acc + jnp.sum(fn(*pool[i % len(pool)]
                                       ).astype(jnp.float32))
            _ = float(acc)
            dt = (time.perf_counter() - t0) / ITERS
            print(f"{name:10s} {dt*1e3:8.2f} ms/iter   relerr={err:.2e}",
                  flush=True)
        except Exception as exc:  # compile failures: report, keep going
            print(f"{name:10s} SKIP: {type(exc).__name__}: "
                  f"{str(exc)[:200]}", flush=True)


if __name__ == "__main__":
    main()
