"""MobileNetV3 Large/Small backbones emitting a 3-level feature pyramid.

Capability parity with R2/nn/backbone/mobilenetv3.py: the classification
MobileNetV3 modified to return three pyramid levels for the HybridEncoder
(strides 8/16/32-equivalent). Implemented natively in flax with the
standard inverted-residual + squeeze-excite blocks.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import apply_norm


def _hswish(x):
    return x * nn.relu6(x + 3.0) / 6.0


def _hsigmoid(x):
    return nn.relu6(x + 3.0) / 6.0


class SqueezeExcite(nn.Module):
    channels: int
    reduction: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Dense(self.channels // self.reduction, dtype=self.dtype,
                     name="fc1")(s)
        s = nn.relu(s)
        s = nn.Dense(self.channels, dtype=self.dtype, name="fc2")(s)
        return x * _hsigmoid(s)


class InvertedResidual(nn.Module):
    kernel: int
    exp_size: int
    ch_out: int
    use_se: bool
    use_hs: bool
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = _hswish if self.use_hs else nn.relu
        ch_in = x.shape[-1]
        identity = x

        y = x
        if self.exp_size != ch_in:
            y = nn.Conv(self.exp_size, (1, 1), use_bias=False,
                        dtype=self.dtype, name="expand_conv")(y)
            y = apply_norm("bn", self.exp_size, "expand_bn", y, train,
                           self.dtype)
            y = act(y)
        y = nn.Conv(
            self.exp_size, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=(self.kernel - 1) // 2,
            feature_group_count=self.exp_size,
            use_bias=False, dtype=self.dtype, name="dw_conv",
        )(y)
        y = apply_norm("bn", self.exp_size, "dw_bn", y, train, self.dtype)
        if self.use_se:
            y = SqueezeExcite(self.exp_size, dtype=self.dtype, name="se")(y)
        y = act(y)
        y = nn.Conv(self.ch_out, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_conv")(y)
        y = apply_norm("bn", self.ch_out, "project_bn", y, train, self.dtype)

        if self.stride == 1 and ch_in == self.ch_out:
            y = y + identity
        return y


# (kernel, exp, out, SE, HS, stride)
_LARGE = [
    (3, 16, 16, 0, 0, 1),
    (3, 64, 24, 0, 0, 2),
    (3, 72, 24, 0, 0, 1),
    (5, 72, 40, 1, 0, 2),
    (5, 120, 40, 1, 0, 1),
    (5, 120, 40, 1, 0, 1),
    (3, 240, 80, 0, 1, 2),
    (3, 200, 80, 0, 1, 1),
    (3, 184, 80, 0, 1, 1),
    (3, 184, 80, 0, 1, 1),
    (3, 480, 112, 1, 1, 1),
    (3, 672, 112, 1, 1, 1),
    (5, 672, 160, 1, 1, 2),
    (5, 960, 160, 1, 1, 1),
    (5, 960, 160, 1, 1, 1),
]

_SMALL = [
    (3, 16, 16, 1, 0, 2),
    (3, 72, 24, 0, 0, 2),
    (3, 88, 24, 0, 0, 1),
    (5, 96, 40, 1, 1, 2),
    (5, 240, 40, 1, 1, 1),
    (5, 240, 40, 1, 1, 1),
    (5, 120, 48, 1, 1, 1),
    (5, 144, 48, 1, 1, 1),
    (5, 288, 96, 1, 1, 2),
    (5, 576, 96, 1, 1, 1),
    (5, 576, 96, 1, 1, 1),
]


class MobileNetV3(nn.Module):
    """Returns the three deepest-stride pyramid levels (after the stride-8,
    stride-16 and stride-32 stages), matching the multi-level tail of the
    reference's modified MobileNetV3."""

    mode: str = "large"
    width_mult: float = 1.0
    dtype: Any = jnp.float32

    @property
    def out_channels(self):
        cfg = _LARGE if self.mode == "large" else _SMALL
        outs = []
        stride_acc = 2
        last_at_stride = {}
        for (_, _, out, _, _, s) in cfg:
            stride_acc *= s
            last_at_stride[stride_acc] = int(out * self.width_mult)
        return [last_at_stride[8], last_at_stride[16], last_at_stride[32]]

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = _LARGE if self.mode == "large" else _SMALL
        x = nn.Conv(16, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        x = apply_norm("bn", 16, "stem_bn", x, train, self.dtype)
        x = _hswish(x)

        outs = {}
        stride_acc = 2
        for i, (k, exp, out, se, hs, s) in enumerate(cfg):
            stride_acc *= s
            x = InvertedResidual(
                kernel=k,
                exp_size=int(exp * self.width_mult),
                ch_out=int(out * self.width_mult),
                use_se=bool(se),
                use_hs=bool(hs),
                stride=s,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, train)
            outs[stride_acc] = x
        return [outs[8], outs[16], outs[32]]
