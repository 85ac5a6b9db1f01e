"""DETR encoder/decoder transformer (flax), matching the reference semantics:
positional embeddings are added to q/k inside each attention (not to values),
the decoder returns the per-layer intermediate stack, and pre/post-norm are
both supported (R1/models/transformer.py:18-129).

TPU notes: all attention shapes are static (no padding masks — crops are
fixed-size). The encoder's self-attention optionally runs through the
Pallas flash kernel (use_flash) — profiling showed the materialized
(T, T) score tensor is the model's HBM hot spot at batch 256.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class _Attention(nn.Module):
    """Multi-head attention with a selectable core:

    * ``fused`` (default) — whole-sequence Pallas kernel
      (ops/fused_attention.py): scores never touch HBM. Used whenever the
      attention itself needs no dropout (eval always; train with dropout 0).
    * ``xla``  — plain einsum/softmax with attention-weight dropout
      (training path, matching flax/torch MHA semantics).
    * ``flash`` — stock streaming flash kernel, kept for large-T configs.

    All cores share the same projection parameters (mha_query/key/value/out
    DenseGenerals, flax-MHA-equivalent), so one init covers every path.
    """

    d_model: int
    nhead: int
    dropout: float = 0.1
    dtype: Any = jnp.float32
    impl: str = "fused"  # fused | xla | flash
    quant: bool = False  # int8 q/k/v/out projections (eval deployment)
    quant_core: bool = False  # ALSO run QK^T/AV int8 — measured a NET
    # LOSS end-to-end (1883 vs 2818 img/s static-PTQ @224 batch 256): the
    # int32 score tensor doubles HBM score traffic and the D=32 QK^T
    # contraction gains nothing from the int8 MXU. Kept as an option; off
    # on the deployment path (PERF.md).

    @nn.compact
    def __call__(self, q, k, v, deterministic: bool = True, attn_mask=None):
        """``attn_mask``: optional (Tq, Tk) bool, True = BLOCKED (torch
        MultiheadAttention convention — used by the CDN denoising groups,
        R2/src/zoo/rtdetr/denoising.py:112-140). Forces the xla core."""
        head_dim = self.d_model // self.nhead
        sm_scale = 1.0 / (head_dim ** 0.5)
        from ..ops.quantize import quant_scope
        from .layers import QDenseGeneral

        DG = (QDenseGeneral if self.quant and quant_scope("attn_proj")
              else nn.DenseGeneral)
        proj = lambda name, x: DG(
            features=(self.nhead, head_dim), dtype=self.dtype,
            name=f"mha_{name}",
        )(x)
        # Under a tp_activation_sharding context (parallel/tp.py), pin the
        # projected tensors to the (batch x head) layout the TP param map
        # implies — without this GSPMD resolves the decoder cross-attn
        # k/v to batch-sharded-only and pays an involuntary full
        # rematerialization at the head-sharded consumer.
        from ..parallel.tp import constrain_heads

        qh = constrain_heads(
            proj("query", q).transpose(0, 2, 1, 3), 1)  # (B, H, T, D)
        kh = constrain_heads(proj("key", k).transpose(0, 2, 1, 3), 1)
        vh = constrain_heads(proj("value", v).transpose(0, 2, 1, 3), 1)

        needs_dropout = self.dropout > 0.0 and not deterministic
        impl = self.impl if not needs_dropout else "xla"
        if attn_mask is not None:
            impl = "xla"  # masked self-attn (CDN groups): small N, xla core
        if impl == "fused" and q.shape[1] < 256:
            # Tiny sequences (decoder queries, AIFI levels): per-(b,h)
            # kernel-launch overhead beats any score-traffic savings.
            impl = "xla"
        if self.quant and self.quant_core and not needs_dropout:
            # int8 deployment core: exact-int32 QK^T, f32 softmax, and an
            # int8 x int8 AV matmul whose T-deep contraction runs at the
            # MXU's 2x int8 rate (ops/quantize.int8_attention_core).
            from .layers import _act_scale_or_calibrate
            from ..ops.quantize import int8_attention_core

            scales = tuple(
                _act_scale_or_calibrate(self, t, f"amax_{n}")
                for n, t in (("q", qh), ("k", kh), ("v", vh))
            )
            out = int8_attention_core(qh, kh, vh, sm_scale, scales)
        elif impl == "fused":
            from ..ops.fused_attention import fused_self_attention

            out = fused_self_attention(qh, kh, vh, sm_scale)
        elif impl == "flash":
            from ..ops.flash_attention import flash_self_attention

            out = flash_self_attention(qh, kh, vh, sm_scale=sm_scale)
        else:
            # Scores/softmax in the model dtype (flax-MHA semantics): an f32
            # score tensor triples attention time at this scale (measured
            # 47 ms vs 16 ms per layer at batch 256 on v5e).
            s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * jnp.asarray(
                sm_scale, qh.dtype
            )
            if attn_mask is not None:
                s = jnp.where(attn_mask[None, None],
                              jnp.asarray(-1e9, s.dtype), s)
            p = jax.nn.softmax(s, axis=-1)
            p = nn.Dropout(self.dropout)(p, deterministic=deterministic)
            out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(vh.dtype), vh)

        out = constrain_heads(out.transpose(0, 2, 1, 3), 2)  # (B, T, H, D)
        return DG(
            features=self.d_model, axis=(-2, -1), dtype=self.dtype,
            name="mha_out",
        )(out)


class EncoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    normalize_before: bool = False
    dtype: Any = jnp.float32
    use_flash: bool = False
    quant: bool = False  # int8 FFN (eval deployment option)

    @nn.compact
    def __call__(self, src, pos, deterministic: bool = True):
        from ..ops.quantize import quant_scope
        from .layers import QDense

        Dense = (QDense if self.quant and quant_scope("ffn")
                 else nn.Dense)
        act = {"relu": nn.relu,
               "gelu": lambda x: nn.gelu(x, approximate=False)}[
            self.activation]  # torch nn.GELU is erf-exact

        def sa(x_qk_src):
            q = k = x_qk_src + pos
            return _Attention(self.d_model, self.nhead, self.dropout,
                              self.dtype,
                              impl="flash" if self.use_flash else "fused",
                              quant=self.quant, name="self_attn")(
                q, k, x_qk_src, deterministic)

        def ffn(x):
            x = Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
            x = act(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            return Dense(self.d_model, dtype=self.dtype, name="linear2")(x)

        drop = lambda x: nn.Dropout(self.dropout)(x, deterministic=deterministic)
        # Sequence-parallel layout hook (parallel/sp.py): identity unless a
        # sequence_sharding context is active at trace time, in which case
        # the LN/FFN/residual segments between attentions run token-sharded.
        from ..parallel.sp import constrain_seq

        if self.normalize_before:
            src2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(src)
            src = constrain_seq(src + drop(sa(src2)))
            src2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(src)
            src = constrain_seq(src + drop(ffn(src2)))
        else:
            src = src + drop(sa(src))
            src = constrain_seq(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(src))
            src = src + drop(ffn(src))
            src = constrain_seq(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(src))
        return src


class DecoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    normalize_before: bool = False
    dtype: Any = jnp.float32
    quant: bool = False  # int8 projections/FFN (eval deployment option)

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos, deterministic: bool = True):
        from .layers import QDense

        Dense = QDense if self.quant else nn.Dense
        act = {"relu": nn.relu,
               "gelu": lambda x: nn.gelu(x, approximate=False)}[
            self.activation]  # torch nn.GELU is erf-exact
        drop = lambda x: nn.Dropout(self.dropout)(x, deterministic=deterministic)

        # Decoder sequences are tiny (num_queries=20): per-(b,h) kernel
        # launches would dominate — plain XLA attention is faster here.
        # Under quant the K/V projections of the 784-token memory (the
        # decoder's main cost) run int8.
        def sa(x):
            q = k = x + query_pos
            return _Attention(self.d_model, self.nhead, self.dropout,
                              self.dtype, impl="xla", quant=self.quant,
                              name="self_attn")(
                q, k, x, deterministic)

        def ca(x):
            return _Attention(self.d_model, self.nhead, self.dropout,
                              self.dtype, impl="xla", quant=self.quant,
                              name="cross_attn")(
                x + query_pos, memory + pos, memory, deterministic)

        def ffn(x):
            x = Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
            x = act(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            return Dense(self.d_model, dtype=self.dtype, name="linear2")(x)

        if self.normalize_before:
            tgt2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(tgt)
            tgt = tgt + drop(sa(tgt2))
            tgt2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(tgt)
            tgt = tgt + drop(ca(tgt2))
            tgt2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(tgt)
            tgt = tgt + drop(ffn(tgt2))
        else:
            tgt = tgt + drop(sa(tgt))
            tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(tgt)
            tgt = tgt + drop(ca(tgt))
            tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(tgt)
            tgt = tgt + drop(ffn(tgt))
            tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(tgt)
        return tgt


class Transformer(nn.Module):
    """Full DETR transformer. Input feature map (B, H, W, C) is flattened to
    (B, HW, C); returns the stacked decoder intermediates
    (num_dec_layers, B, num_queries, C)."""

    d_model: int = 256
    nhead: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    normalize_before: bool = False
    dtype: Any = jnp.float32
    use_flash: bool = False
    quant: bool = False
    remat: bool = False  # rematerialize encoder layers (frees the stored
    # (T, T) attention tensors for backward - trades flops for HBM)

    @nn.compact
    def __call__(self, src, query_embed, pos_embed, deterministic: bool = True):
        from ..ops.quantize import quant_scope

        b, h, w, c = src.shape
        src = src.reshape(b, h * w, c)
        pos = pos_embed.reshape(1, h * w, c).astype(self.dtype)
        query_pos = query_embed[None, :, :].repeat(b, axis=0).astype(self.dtype)

        mem = src
        enc_cls = EncoderLayer
        if self.remat and not deterministic:
            enc_cls = nn.remat(EncoderLayer, static_argnums=(2,))
        for i in range(self.num_encoder_layers):
            mem = enc_cls(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                self.activation, self.normalize_before, self.dtype,
                self.use_flash, self.quant, name=f"encoder_layer_{i}",
            )(mem, pos, deterministic)
        if self.normalize_before:
            mem = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="encoder_norm")(mem)

        tgt = jnp.zeros_like(query_pos)
        intermediates = []
        final_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="decoder_norm")
        for i in range(self.num_decoder_layers):
            tgt = DecoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                self.activation, self.normalize_before, self.dtype,
                self.quant and quant_scope("dec"),
                name=f"decoder_layer_{i}",
            )(tgt, mem, pos, query_pos, deterministic)
            intermediates.append(final_norm(tgt))

        return jnp.stack(intermediates, axis=0), mem
