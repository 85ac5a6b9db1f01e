"""GhostNetV2 backbone emitting a 3-level pyramid (flax, NHWC).

Capability parity with R2/nn/backbone/ghostnetv2.py (#42): GhostNetV2
(CVPR'22 "GhostNetV2: Enhance Cheap Operation with Long-Range Attention")
with Ghost modules (primary conv + cheap depthwise op) and the decoupled
fully-connected (DFC) attention branch, modified like the reference to
return the stride-8/16/32 feature maps for the HybridEncoder instead of a
classification head. No timm dependency — native implementation.
"""
from __future__ import annotations

import math
from typing import Any, List

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import apply_norm


def _make_divisible(v, divisor=4):
    return max(divisor, int(v + divisor / 2) // divisor * divisor)


def _hswish(x):
    return x * nn.relu6(x + 3.0) / 6.0


class GhostModule(nn.Module):
    ch_out: int
    kernel: int = 1
    ratio: int = 2
    dw_size: int = 3
    relu: bool = True
    mode: str = "original"  # original | attn (DFC)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        init_ch = math.ceil(self.ch_out / self.ratio)
        new_ch = init_ch * (self.ratio - 1)

        y1 = nn.Conv(init_ch, (self.kernel, self.kernel),
                     padding=self.kernel // 2, use_bias=False,
                     dtype=self.dtype, name="primary_conv")(x)
        y1 = apply_norm("bn", init_ch, "primary_bn", y1, train, self.dtype)
        if self.relu:
            y1 = nn.relu(y1)
        y2 = nn.Conv(new_ch, (self.dw_size, self.dw_size),
                     padding=self.dw_size // 2,
                     feature_group_count=init_ch, use_bias=False,
                     dtype=self.dtype, name="cheap_conv")(y1)
        y2 = apply_norm("bn", new_ch, "cheap_bn", y2, train, self.dtype)
        if self.relu:
            y2 = nn.relu(y2)
        out = jnp.concatenate([y1, y2], axis=-1)[..., : self.ch_out]

        if self.mode == "attn":
            # DFC attention: downsample 2x, 1x1 conv, decoupled 1x5/5x1
            # depthwise convs, sigmoid gate, upsample back.
            b, h, w, _ = x.shape
            a = nn.avg_pool(x, (2, 2), strides=(2, 2))
            a = nn.Conv(self.ch_out, (1, 1), use_bias=False,
                        dtype=self.dtype, name="short_conv")(a)
            a = apply_norm("bn", self.ch_out, "short_bn", a, train, self.dtype)
            a = nn.Conv(self.ch_out, (1, 5), padding=(0, 2),
                        feature_group_count=self.ch_out, use_bias=False,
                        dtype=self.dtype, name="dfc_h")(a)
            a = apply_norm("bn", self.ch_out, "dfc_h_bn", a, train, self.dtype)
            a = nn.Conv(self.ch_out, (5, 1), padding=(2, 0),
                        feature_group_count=self.ch_out, use_bias=False,
                        dtype=self.dtype, name="dfc_v")(a)
            a = apply_norm("bn", self.ch_out, "dfc_v_bn", a, train, self.dtype)
            gate = jax.nn.sigmoid(a)
            # torch F.interpolate(mode='nearest') = floor-index sampling
            hi = jnp.arange(h) * gate.shape[1] // h
            wi = jnp.arange(w) * gate.shape[2] // w
            gate = gate[:, hi][:, :, wi].astype(out.dtype)
            out = out * gate
        return out


class GhostBottleneckV2(nn.Module):
    mid_ch: int
    ch_out: int
    dw_kernel: int = 3
    stride: int = 1
    se_ratio: float = 0.0
    layer_id: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch_in = x.shape[-1]
        # GhostNetV2 uses DFC attention from layer 2 onward.
        mode = "original" if self.layer_id <= 1 else "attn"
        y = GhostModule(self.mid_ch, relu=True, mode=mode, dtype=self.dtype,
                        name="ghost1")(x, train)
        if self.stride > 1:
            y = nn.Conv(self.mid_ch, (self.dw_kernel, self.dw_kernel),
                        strides=(self.stride, self.stride),
                        padding=(self.dw_kernel - 1) // 2,
                        feature_group_count=self.mid_ch, use_bias=False,
                        dtype=self.dtype, name="dw_conv")(y)
            y = apply_norm("bn", self.mid_ch, "dw_bn", y, train, self.dtype)
        if self.se_ratio > 0:
            s = jnp.mean(y, axis=(1, 2), keepdims=True)
            red = _make_divisible(self.mid_ch * self.se_ratio)
            s = nn.relu(nn.Conv(red, (1, 1), dtype=self.dtype,
                                name="se_reduce")(s))
            s = nn.Conv(self.mid_ch, (1, 1), dtype=self.dtype,
                        name="se_expand")(s)
            y = y * jnp.clip(s + 3.0, 0.0, 6.0) / 6.0
        y = GhostModule(self.ch_out, relu=False, dtype=self.dtype,
                        name="ghost2")(y, train)

        if self.stride == 1 and ch_in == self.ch_out:
            short = x
        else:
            short = nn.Conv(ch_in, (self.dw_kernel, self.dw_kernel),
                            strides=(self.stride, self.stride),
                            padding=(self.dw_kernel - 1) // 2,
                            feature_group_count=ch_in, use_bias=False,
                            dtype=self.dtype, name="short_dw")(x)
            short = apply_norm("bn", ch_in, "short_dw_bn", short, train,
                               self.dtype)
            short = nn.Conv(self.ch_out, (1, 1), use_bias=False,
                            dtype=self.dtype, name="short_pw")(short)
            short = apply_norm("bn", self.ch_out, "short_pw_bn", short, train,
                               self.dtype)
        return y + short


# (dw_kernel, mid, out, se_ratio, stride) per block, grouped in the
# reference's 9 stages (R2 ghostnetv2.py:297-319)
_CFG = [
    [(3, 16, 16, 0.0, 1)],
    [(3, 48, 24, 0.0, 2)],
    [(3, 72, 24, 0.0, 1)],
    [(5, 72, 40, 0.25, 2)],
    [(5, 120, 40, 0.25, 1)],
    [(3, 240, 80, 0.0, 2)],
    [(3, 200, 80, 0.0, 1),
     (3, 184, 80, 0.0, 1),
     (3, 184, 80, 0.0, 1),
     (3, 480, 112, 0.25, 1),
     (3, 672, 112, 0.25, 1)],
    [(5, 672, 160, 0.25, 2)],
    [(5, 960, 160, 0.0, 1),
     (5, 960, 160, 0.25, 1),
     (5, 960, 160, 0.0, 1),
     (5, 960, 160, 0.25, 1)],
]


class GhostNetV2(nn.Module):
    """Reference-variant GhostNetV2 pyramid (R2 ghostnetv2.py:286-442):
    level 0/1 come from a side branch on the PRE-BN stem output resized to
    input/4 (reference hardcodes (64, 64) for its 256 input) through two
    stride-2 3x3 convs with BN+hardswish; level 2 is the 960-channel bneck
    tail (stage 9 ConvBnAct) through a 1x1 512 conv. Module names mirror
    the torch attributes (conv_stem/bn1, Conv{1,2,3}/Bn{1,2,3},
    blocks_{stage}_{i}) for checkpoint conversion; the dead classifier
    tail (global_pool/conv_head/classifier) is not reproduced."""

    width: float = 1.0
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> List[int]:
        return [128, 256, 512]

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..ops.image_warp import resize_bilinear_torch

        stem = _make_divisible(16 * self.width)
        out = nn.Conv(stem, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                      dtype=self.dtype, name="conv_stem")(x)

        # side branch taps the PRE-BN stem output (R2 ghostnetv2.py:420)
        b = resize_bilinear_torch(out, x.shape[1] // 4, x.shape[2] // 4)
        b = nn.Conv(128, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, name="Conv1")(b)
        b = apply_norm("bn", 128, "Bn1", b, train, self.dtype)
        b = _hswish(b)
        c = nn.Conv(256, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, name="Conv2")(b)
        c = apply_norm("bn", 256, "Bn2", c, train, self.dtype)
        c = _hswish(c)

        out = apply_norm("bn", stem, "bn1", out, train, self.dtype)
        out = nn.relu(out)

        layer_id = 0
        for si, stage in enumerate(_CFG):
            for bi, (k, mid, ch, se, s) in enumerate(stage):
                out = GhostBottleneckV2(
                    mid_ch=_make_divisible(mid * self.width),
                    ch_out=_make_divisible(ch * self.width),
                    dw_kernel=k,
                    stride=s,
                    se_ratio=se,
                    layer_id=layer_id,
                    dtype=self.dtype,
                    name=f"blocks_{si}_{bi}",
                )(out, train)
                layer_id += 1
        # stage 9: ConvBnAct 160 -> 960 (R2 ghostnetv2.py:376)
        tail_ch = _make_divisible(960 * self.width)
        out = nn.Conv(tail_ch, (1, 1), use_bias=False, dtype=self.dtype,
                      name="blocks_9_0_conv")(out)
        out = apply_norm("bn", tail_ch, "blocks_9_0_bn1", out, train,
                         self.dtype)
        out = nn.relu(out)

        out = nn.Conv(512, (1, 1), use_bias=False, dtype=self.dtype,
                      name="Conv3")(out)
        out = apply_norm("bn", 512, "Bn3", out, train, self.dtype)
        out = _hswish(out)
        return [b, c, out]
