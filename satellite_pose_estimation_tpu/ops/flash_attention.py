"""Flash self-attention wrapper (Pallas TPU kernel).

The DETR encoder's plain attention materializes a (B, H, T, T) score tensor
— at T=784, batch 256 that is ~2.5 GB of HBM traffic per layer and is the
profiled hot spot. The Pallas flash kernel streams K/V blocks through VMEM
instead. Sequences are padded to a lane multiple; padding is excluded with
segment ids (pad tokens live in their own segment), which costs O(B*T)
instead of a materialized O(B*H*T*T) bias.

STATUS: experimental; with whole-sequence blocks it reaches 2106 img/s
end-to-end vs 2256 img/s for XLA's fused plain attention at this model's
scale (T=784, head_dim 32, batch 256) — the pallas_call boundary still
loses slightly to full-graph fusion. Kept as an option (BENCH_FLASH=1 /
DETRConfig.use_flash_attention); it should win at larger T or head_dim.
Numerics verified equivalent (1.2e-3 at T=784).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def flash_self_attention(q, k, v, sm_scale: float):
    """q/k/v: (B, H, T, D). Returns (B, H, T, D) matching plain softmax
    attention on the T real tokens."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    B, H, T, D = q.shape
    Tp = _round_up(T, 128)
    pad = Tp - T

    if pad:
        zeros = jnp.zeros((B, H, pad, D), q.dtype)
        q = jnp.concatenate([q, zeros], axis=2)
        k = jnp.concatenate([k, zeros], axis=2)
        v = jnp.concatenate([v, zeros], axis=2)
        seg = jnp.concatenate(
            [jnp.ones((B, T), jnp.int32), jnp.zeros((B, pad), jnp.int32)],
            axis=1,
        )
        segment_ids = SegmentIds(q=seg, kv=seg)
    else:
        segment_ids = None

    # Whole-sequence blocks: at T<=1024 the full (block_q, block_k) score
    # tile fits VMEM, so one grid step per (batch, head) beats many tiny
    # 128-lane steps (kernel-launch bound otherwise).
    block = Tp if Tp <= 1024 else next(
        b for b in (512, 256, 128) if Tp % b == 0
    )
    sizes = BlockSizes(
        block_q=block, block_k_major=block, block_k=block, block_b=1,
        block_q_major_dkv=block, block_k_major_dkv=block,
        block_k_dkv=block, block_q_dkv=block,
        block_k_major_dq=block, block_k_dq=block, block_q_dq=block,
    )
    out = flash_attention(q, k, v, segment_ids=segment_ids,
                          sm_scale=sm_scale, block_sizes=sizes)
    return out[:, :, :T, :]
