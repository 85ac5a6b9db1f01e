"""HybridEncoder — AIFI intra-scale transformer + CCFM cross-scale CSP-RepVgg
fusion (flax, NHWC).

Capability parity with R2/src/zoo/rtdetr/hybrid_encoder.py:201-401:
* per-level 1x1 conv+BN projection to hidden_dim;
* AIFI: a 1-layer transformer encoder over the smallest level's tokens with
  a cached 2D sincos position embedding;
* CCFM: top-down FPN (nearest 2x upsample, CSPRepLayer fuse) then bottom-up
  PAN (bicubic 0.5x downsample, CSPRepLayer fuse);
* RepVggBlock trains with parallel 3x3+1x1 conv+BN branches; ``deploy``
  mode folds both into one 3x3 conv (fuse_repvgg_params computes the folded
  kernel, the reference's convert_to_deploy).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import apply_norm, get_activation
from .position_encoding import build_2d_sincos_position_embedding
from .transformer import EncoderLayer


class ConvNormLayer(nn.Module):
    ch_out: int
    kernel: int
    stride: int = 1
    padding: int | None = None
    act: str | None = None
    norm: str = "bn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2 if self.padding is None else self.padding
        from ..ops.quantize import quantization_active

        if quantization_active() and not train:
            from .layers import QConv as Conv
        else:
            Conv = nn.Conv
        x = Conv(
            self.ch_out,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=pad,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = apply_norm(self.norm, self.ch_out, "norm", x, train, self.dtype)
        if self.act:
            x = get_activation(self.act)(x)
        return x


class RepVggBlock(nn.Module):
    """Train-time two-branch block (3x3 + 1x1, each conv+BN); at deploy the
    branches fold into one 3x3 conv (R2 hybrid_encoder.py:37-87)."""

    ch_out: int
    act: str = "relu"
    norm: str = "bn"
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.deploy:
            y = nn.Conv(self.ch_out, (3, 3), padding=1, dtype=self.dtype,
                        name="conv_fused")(x)
        else:
            y1 = ConvNormLayer(self.ch_out, 3, 1, act=None, norm=self.norm,
                               dtype=self.dtype, name="conv1")(x, train)
            y2 = ConvNormLayer(self.ch_out, 1, 1, padding=0, act=None,
                               norm=self.norm, dtype=self.dtype,
                               name="conv2")(x, train)
            y = y1 + y2
        return get_activation(self.act)(y)


def fuse_repvgg_params(block_params, block_stats, eps=1e-5):
    """Fold (conv3x3+BN, conv1x1+BN) into a single 3x3 conv kernel + bias.

    Input trees follow RepVggBlock's train-mode structure; returns
    {'conv_fused': {'kernel', 'bias'}} for the deploy-mode module. Kernel
    layout is flax NHWC: (kh, kw, cin, cout).
    """
    def fold(conv, bn_params, bn_stats):
        kernel = conv["kernel"]
        gamma = bn_params["scale"]
        beta = bn_params["bias"]
        mean = bn_stats["mean"]
        var = bn_stats["var"]
        std = jnp.sqrt(var + eps)
        t = gamma / std  # (cout,)
        return kernel * t[None, None, None, :], beta - mean * t

    k3, b3 = fold(
        block_params["conv1"]["conv"],
        block_params["conv1"]["norm"],
        block_stats["conv1"]["norm"],
    )
    k1, b1 = fold(
        block_params["conv2"]["conv"],
        block_params["conv2"]["norm"],
        block_stats["conv2"]["norm"],
    )
    k1_padded = jnp.pad(k1, ((1, 1), (1, 1), (0, 0), (0, 0)))
    return {"conv_fused": {"kernel": k3 + k1_padded, "bias": b3 + b1}}


class CSPRepLayer(nn.Module):
    ch_out: int
    num_blocks: int = 3
    expansion: float = 1.0
    act: str = "silu"
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.ch_out * self.expansion)
        x1 = ConvNormLayer(hidden, 1, 1, act=self.act, dtype=self.dtype,
                           name="conv1")(x, train)
        for i in range(self.num_blocks):
            x1 = RepVggBlock(hidden, act=self.act, deploy=self.deploy,
                             dtype=self.dtype, name=f"bottlenecks_{i}")(x1, train)
        x2 = ConvNormLayer(hidden, 1, 1, act=self.act, dtype=self.dtype,
                           name="conv2")(x, train)
        y = x1 + x2
        if hidden != self.ch_out:
            y = ConvNormLayer(self.ch_out, 1, 1, act=self.act, dtype=self.dtype,
                              name="conv3")(y, train)
        return y


class HybridEncoder(nn.Module):
    in_channels: Sequence[int] = (512, 1024, 2048)
    feat_strides: Sequence[int] = (8, 16, 32)
    hidden_dim: int = 256
    nhead: int = 8
    dim_feedforward: int = 1024
    dropout: float = 0.0
    enc_act: str = "gelu"
    use_encoder_idx: Sequence[int] = (2,)
    num_encoder_layers: int = 1
    pe_temperature: float = 10000.0
    expansion: float = 1.0
    act: str = "silu"
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        from ..ops.quantize import quantization_active

        assert len(feats) == len(self.in_channels)
        proj = []
        for i, feat in enumerate(feats):
            x = nn.Conv(self.hidden_dim, (1, 1), use_bias=False,
                        dtype=self.dtype, name=f"input_proj_{i}_conv")(feat)
            x = apply_norm("bn", self.hidden_dim, f"input_proj_{i}_norm",
                           x, train, self.dtype)
            proj.append(x)

        # AIFI on selected level(s)
        for i, enc_ind in enumerate(self.use_encoder_idx):
            b, h, w, c = proj[enc_ind].shape
            src = proj[enc_ind].reshape(b, h * w, c)
            pos = build_2d_sincos_position_embedding(
                w, h, self.hidden_dim, self.pe_temperature
            )[None].astype(self.dtype)
            mem = src
            for l in range(self.num_encoder_layers):
                mem = EncoderLayer(
                    self.hidden_dim, self.nhead, self.dim_feedforward,
                    self.dropout, self.enc_act, False, self.dtype,
                    quant=quantization_active() and not train,
                    name=f"encoder_{i}_layer_{l}",
                )(mem, pos, deterministic=not train)
            proj[enc_ind] = mem.reshape(b, h, w, c)

        # top-down FPN
        n = len(self.in_channels)
        inner_outs = [proj[-1]]
        for idx in range(n - 1, 0, -1):
            feat_high = inner_outs[0]
            feat_low = proj[idx - 1]
            feat_high = ConvNormLayer(
                self.hidden_dim, 1, 1, act=self.act, dtype=self.dtype,
                name=f"lateral_convs_{n - 1 - idx}",
            )(feat_high, train)
            inner_outs[0] = feat_high
            b, h, w, c = feat_high.shape
            up = jax.image.resize(
                feat_high, (b, h * 2, w * 2, c), method="nearest"
            )
            fused = CSPRepLayer(
                self.hidden_dim, 1, self.expansion, self.act, self.deploy,
                self.dtype, name=f"fpn_blocks_{n - 1 - idx}",
            )(jnp.concatenate([up, feat_low], axis=-1), train)
            inner_outs.insert(0, fused)

        # bottom-up PAN (bicubic 0.5x downsample, R2 hybrid_encoder.py:394)
        outs = [inner_outs[0]]
        for idx in range(n - 1):
            feat_low = outs[-1]
            feat_high = inner_outs[idx + 1]
            from ..ops.image_warp import resize_bicubic_torch

            b, h, w, c = feat_low.shape
            # torch bicubic without antialias (jax.image.resize 'cubic'
            # antialiases on downscale and diverges from the reference)
            down = resize_bicubic_torch(feat_low, h // 2, w // 2)
            out = CSPRepLayer(
                self.hidden_dim, 1, self.expansion, self.act, self.deploy,
                self.dtype, name=f"pan_blocks_{idx}",
            )(jnp.concatenate([down, feat_high], axis=-1), train)
            outs.append(out)
        return outs


class HybridEncoderModify(HybridEncoder):
    """Single-resolution fusion variant (R2 hybrid_encoder_modify.py:18-109):
    all three pyramid levels are bilinearly resized to the MIDDLE level's
    resolution before fusion, the AIFI encoder runs on the resized deepest
    level, and the FPN/PAN blocks fuse without any further up/down sampling
    (every level shares one spatial size, so outputs are three same-size
    maps)."""

    @nn.compact
    def __call__(self, feats, train: bool = False):
        from ..ops.quantize import quantization_active

        assert len(feats) == len(self.in_channels)
        proj = []
        for i, feat in enumerate(feats):
            x = nn.Conv(self.hidden_dim, (1, 1), use_bias=False,
                        dtype=self.dtype, name=f"input_proj_{i}_conv")(feat)
            x = apply_norm("bn", self.hidden_dim, f"input_proj_{i}_norm",
                           x, train, self.dtype)
            proj.append(x)

        from ..ops.image_warp import resize_bilinear_torch

        b, hm, wm, c = proj[1].shape
        # torch-exact bilinear; the reference sizes BOTH axes from H
        # (size=(shape[2], shape[2]), hybrid_encoder_modify.py:22-33) —
        # bug-compatible for the square inputs it is used with
        resize = lambda t: resize_bilinear_torch(t, hm, hm)
        p0 = resize(proj[0])
        p2 = resize(proj[2])

        # AIFI on the resized deepest level
        src = p2.reshape(b, hm * wm, c)
        pos = build_2d_sincos_position_embedding(
            wm, hm, self.hidden_dim, self.pe_temperature
        )[None].astype(self.dtype)
        mem = src
        for l in range(self.num_encoder_layers):
            mem = EncoderLayer(
                self.hidden_dim, self.nhead, self.dim_feedforward,
                self.dropout, self.enc_act, False, self.dtype,
                quant=quantization_active() and not train,
                name=f"encoder_0_layer_{l}",
            )(mem, pos, deterministic=not train)
        p2 = mem.reshape(b, hm, wm, c)

        levels = [p0, proj[1], p2]
        n = len(levels)
        inner_outs = [levels[-1]]
        for idx in range(n - 1, 0, -1):
            feat_high = ConvNormLayer(
                self.hidden_dim, 1, 1, act=self.act, dtype=self.dtype,
                name=f"lateral_convs_{n - 1 - idx}",
            )(inner_outs[0], train)
            inner_outs[0] = feat_high
            fused = CSPRepLayer(
                self.hidden_dim, 1, self.expansion, self.act, self.deploy,
                self.dtype, name=f"fpn_blocks_{n - 1 - idx}",
            )(jnp.concatenate([feat_high, levels[idx - 1]], axis=-1), train)
            inner_outs.insert(0, fused)

        outs = [inner_outs[0]]
        for idx in range(n - 1):
            out = CSPRepLayer(
                self.hidden_dim, 1, self.expansion, self.act, self.deploy,
                self.dtype, name=f"pan_blocks_{idx}",
            )(jnp.concatenate([outs[-1], inner_outs[idx + 1]], axis=-1), train)
            outs.append(out)
        return outs
