"""Whole-sequence fused attention kernel (Pallas/Mosaic, TPU).

The DETR encoder's profiled hot spot is the materialized (B, H, T, T) score
tensor: at T=784, batch 256 each layer moves ~5 GB of scores through HBM and
runs at <10% MXU utilization (pure bandwidth bound). At this scale the FULL
(784, 784) f32 score matrix for one (batch, head) cell is only 2.4 MB — it
fits VMEM outright, so no flash-style streaming/running-max bookkeeping is
needed (round 1 measured the stock flash kernel slightly LOSING to XLA here
because of exactly that machinery). This kernel computes
softmax(q @ k^T) @ v for one (batch, head) per grid step with scores living
and dying in VMEM: HBM traffic drops from O(B*H*T^2) to O(B*H*T*D).

Numerics: scores and softmax in f32 (matching flax's f32 accumulation),
output cast back to the input dtype. Differentiable via custom_vjp with an
XLA recompute backward (train-path attention keeps dropout support through
the flax path; see models/transformer.py).

Reference parity target: the nn.MultiheadAttention inside
R1/models/transformer.py:18-129 — same math, TPU-native execution.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0, 0]  # (T, D), pre-scaled by sm_scale * log2(e)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (T, T) f32, VMEM-resident
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)  # NOT exp2: Mosaic's exp2 lowering measured 3x slower
    l = jnp.sum(e, axis=-1, keepdims=True)
    # Normalize on the (T, D) output, not the (T, T) matrix: one fewer
    # full-score-matrix VPU pass per head.
    o = jax.lax.dot_general(
        e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = (o / l).astype(o_ref.dtype)


def _reference_attention(q, k, v, sm_scale):
    """Plain XLA attention, f32 softmax — the kernel's semantics."""
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * sm_scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


def _q_block_rows(T: int) -> int:
    """Largest q-row strip whose f32 score block (rows, T) fits the VMEM
    budget: the kernel body is identical whether the strip is the whole
    sequence (224/256 inputs, T<=1344) or a slice of it (512 input,
    T=4096 -> 512-row strips; each row still sees the full T, so softmax
    needs no streaming bookkeeping). Returns 0 if no sublane-aligned
    divisor of T fits (caller falls back to plain XLA)."""
    if T * T * 4 <= _VMEM_SCORE_BUDGET_BYTES:
        return T
    max_rows = _VMEM_SCORE_BUDGET_BYTES // (T * 4)
    for rows in range(min(max_rows, T), 7, -1):
        if T % rows == 0 and rows % 8 == 0:
            return rows
    return 0


def _fused_tpu(q, k, v, sm_scale, interpret: bool = False):
    B, H, T, D = q.shape
    rows = _q_block_rows(T)
    qs = (q.astype(jnp.float32) * sm_scale).astype(q.dtype)
    qspec = pl.BlockSpec((1, 1, rows, D), lambda b, h, i: (b, h, i, 0))
    kvspec = pl.BlockSpec((1, 1, T, D), lambda b, h, i: (b, h, 0, 0))
    # At B>=8 T=4096 XLA's output-placement pass VMEM-pins the 16.8 MB
    # output tensor ("S(1)" layout) in a consumer-dependent way, and the
    # op's stack frame (pinned output + kernel scoped) blows the DEFAULT
    # 16 MB scoped-vmem limit at compile time. Two defenses, both needed
    # (aliasing alone was measured insufficient on the backward): alias
    # the dead-after-call pre-scaled q buffer to the output, and raise
    # the per-kernel scoped-vmem limit toward the 128 MB physical VMEM
    # (the same move jax's own flash kernels make).
    return pl.pallas_call(
        _attn_kernel,
        grid=(B, H, T // rows),
        in_specs=[qspec, kvspec, kvspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(qs, k, v)


# Whole-sequence kernels hold the full (T, T) f32 score matrix in VMEM:
# fine through T=1344 (7.4 MB, the 256-input RT-DETR pyramid) but the
# 512-input DETR encoder is T=4096 -> 64 MB, past the ~16 MB scoped-vmem
# limit (the remote compiler hard-fails). Static trace-time gate; above it
# the XLA path runs (scores in HBM — correct, just not score-traffic-free).
_VMEM_SCORE_BUDGET_BYTES = 12 * 2**20

# Raised per-kernel scoped-vmem limit (default 16 MB; v5e physical VMEM is
# 128 MB). Needed because XLA batch-dependently VMEM-pins a large pallas
# output ("S(1)"): at B=8 T=4096 the pinned 16.8 MB dq alone exceeds the
# default limit, a compile-time hard fail, regardless of strip height and
# of output aliasing. Measured on the real v5e remote compiler
# (tools_dev/attn4096_{vmem_probe,pin_ab,validate}.py).
_VMEM_LIMIT = 100 * 2**20


def _fits_vmem(T: int) -> bool:
    return T * T * 4 <= _VMEM_SCORE_BUDGET_BYTES


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_self_attention(q, k, v, sm_scale: float):
    """softmax(sm_scale * q @ k^T) @ v over (B, H, T, D) inputs.

    TPU: single-pass Pallas kernel, zero score HBM traffic — whole-sequence
    when the f32 score matrix fits VMEM, q-row-blocked otherwise (512-input
    T=4096). Other backends (CPU tests): plain XLA with identical math.
    """
    if jax.default_backend() == "tpu" and _q_block_rows(q.shape[2]) > 0:
        return _fused_tpu(q, k, v, sm_scale)
    return _reference_attention(q, k, v, sm_scale)


def _fwd(q, k, v, sm_scale):
    return fused_self_attention(q, k, v, sm_scale), (q, k, v)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref):
    """Attention backward for one (batch, head) q-row strip: recompute the
    strip's s/p in VMEM (flash-style — nothing quadratic is saved to HBM),
    then dv += p^T g, ds = p * (g v^T - rowsum(p * g v^T)), dq = ds k,
    dk += ds^T q. dq is per-strip; dk/dv sum contributions from every strip
    into an f32 block that stays VMEM-resident across the (innermost) strip
    grid axis and is written back once. q arrives pre-scaled, so dq leaves
    pre-scaled too and the wrapper applies sm_scale once. One kernel serves
    both the whole-sequence case (one strip) and 512-input T=4096."""
    i = pl.program_id(2)
    q = q_ref[0, 0]  # (rows, D), pre-scaled
    k = k_ref[0, 0]  # (T, D)
    v = v_ref[0, 0]
    g = g_ref[0, 0]  # (rows, D)
    mm = lambda a, b, dims: jax.lax.dot_general(
        a, b, (dims, ((), ())), preferred_element_type=jnp.float32
    )
    s = mm(q, k, ((1,), (1,)))  # (rows, T) f32
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    p = e / l  # f32 (rows, T), VMEM only
    pb = p.astype(v.dtype)
    dv_part = mm(pb, g, ((0,), (0,)))  # p^T g: (T, D) f32
    dp = mm(g, v, ((1,), (1,)))  # (rows, T) f32
    ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
    dsb = ds.astype(q.dtype)
    dq_ref[0, 0] = mm(dsb, k, ((1,), (0,))).astype(dq_ref.dtype)
    dk_part = mm(dsb, q, ((0,), (0,)))  # (T, D) f32

    @pl.when(i == 0)
    def _init():
        dk_ref[0, 0] = dk_part
        dv_ref[0, 0] = dv_part

    @pl.when(i > 0)
    def _accum():
        dk_ref[0, 0] += dk_part
        dv_ref[0, 0] += dv_part


def _bwd_q_block_rows(T: int) -> int:
    """Strip height for the backward: ~5 (rows, T) f32 score-shaped
    intermediates (s/e/p, dp, ds and their bf16 casts, partially reused)
    are live at once — quarter the forward's per-matrix budget. Whole
    -sequence through T=1344 (the shipped 224/256 inputs — unchanged
    behavior); T=4096 lands on 128-row strips. Calibrated on the real
    v5e remote compiler (tools_dev/attn4096_vmem_probe.py): 256-row
    strips hard-fail the 16 MB scoped-vmem limit at batch>=8 (the
    compiler additionally VMEM-pins the 16.8 MB dq output — "S(1)" —
    in a batch-dependent way), 128-row strips compile and run."""
    if _fits_vmem(T):
        return T
    max_rows = (_VMEM_SCORE_BUDGET_BYTES // 4) // (T * 4)
    for rows in range(min(max_rows, T), 7, -1):
        if T % rows == 0 and rows % 8 == 0:
            return rows
    return 0


def _bwd_tpu(q, k, v, g, sm_scale, interpret: bool = False):
    B, H, T, D = q.shape
    rows = _bwd_q_block_rows(T)
    qs = (q.astype(jnp.float32) * sm_scale).astype(q.dtype)
    qspec = pl.BlockSpec((1, 1, rows, D), lambda b, h, i: (b, h, i, 0))
    kvspec = pl.BlockSpec((1, 1, T, D), lambda b, h, i: (b, h, 0, 0))
    # The raised _VMEM_LIMIT is what admits the compiler's batch-dependent
    # VMEM-pinning of the dq tuple element (S(1), 16.8 MB at B=8 T=4096 —
    # over the default 16 MB limit on its own; aliasing did NOT stop the
    # pinning here, unlike the forward). qs is dead after this call, so
    # the alias still saves one HBM output allocation.
    dq, dk, dv = pl.pallas_call(
        _attn_bwd_kernel,
        grid=(B, H, T // rows),
        in_specs=[qspec, kvspec, kvspec, qspec],
        out_specs=[qspec, kvspec, kvspec],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, T, D), jnp.float32),
            jax.ShapeDtypeStruct((B, H, T, D), jnp.float32),
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(qs, k, v, g.astype(q.dtype))
    dq = (dq.astype(jnp.float32) * sm_scale).astype(q.dtype)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


def _bwd(sm_scale, res, g):
    q, k, v = res
    if jax.default_backend() == "tpu" and _bwd_q_block_rows(q.shape[2]) > 0:
        return _bwd_tpu(q, k, v, g, sm_scale)

    # CPU/other backends: recompute in plain XLA, input dtype (an
    # f32-materialized (B,H,T,T) tensor costs 3x in HBM traffic).
    def f(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * jnp.asarray(
            sm_scale, q.dtype
        )
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    _, vjp = jax.vjp(f, q, k, v)
    return vjp(g.astype(q.dtype))


fused_self_attention.defvjp(_fwd, _bwd)
