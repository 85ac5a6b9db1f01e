"""Small-K top-k for TPU — sort-free, exact.

``jax.lax.top_k`` lowers to XLA's bitonic sort on TPU: O(log^2 L) passes
of latency-bound tiny kernels over the (B, L) score matrix. Measured on
v5e at the RT-DETR decoder's query-selection shape (B=256, L=1344,
K=30): **47.7 ms** standalone (tools_dev/decoder_floor.py round 5) —
86% of the whole decoder stage, dwarfing the deform-attention layers
(2.04 ms each).

For K << L the selection is cheaper as K sequential argmax+mask sweeps:
each iteration is one fused max-reduce + compare over (B, L) (~0.7 MB),
so the whole selection reads ~K * B * L elements of pure VPU work with
no sort network. Exactness: iteration k yields exactly the k-th largest
element, and ties resolve to the lowest index first — the same order
``jax.lax.top_k`` documents — because ``argmax`` picks the first
occurrence and masking is by index, not value.

Reference role: replaces the torch.topk query selection
(R2/src/zoo/rtdetr/rtdetr_decoder.py:654-659) on the TPU hot path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def topk_small_k(scores: jnp.ndarray, k: int, unroll_threshold: int = 64):
    """Exact equivalent of ``jax.lax.top_k(scores, k)`` for 2-D scores.

    Returns (values, indices), both (B, k), descending, ties -> lowest
    index first. Falls back to ``jax.lax.top_k`` when ``k`` is large
    enough that the sort wins (k > unroll_threshold or k close to L).
    """
    B, L = scores.shape
    if k > unroll_threshold or k * 4 >= L:
        return jax.lax.top_k(scores, k)

    # Working dtype: widen sub-f32 floats to f32 (exact embedding, so the
    # comparator order is untouched); KEEP f32/f64 as-is — downcasting
    # f64 scores could flip which near-tied token is selected vs
    # lax.top_k (the whole-model parity tests run f64).
    work = (jnp.float32 if scores.dtype in (jnp.bfloat16, jnp.float16)
            else scores.dtype)
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    neg = jnp.asarray(-jnp.inf, work)

    def step(s, _):
        idx = jnp.argmax(s, axis=-1)  # (B,) first-occurrence on ties
        val = jnp.take_along_axis(s, idx[:, None], axis=1)[:, 0]
        s = jnp.where(iota == idx[:, None], neg, s)
        return s, (val, idx)

    _, (vals, idxs) = jax.lax.scan(
        step, scores.astype(work), None, length=k)
    return (jnp.moveaxis(vals, 0, 1).astype(scores.dtype),
            jnp.moveaxis(idxs, 0, 1))
