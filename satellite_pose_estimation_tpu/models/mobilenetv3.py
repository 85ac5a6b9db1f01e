"""MobileNetV3 Large/Small backbones — the reference's CUSTOM variant
(R2/nn/backbone/mobilenetv3.py:16-330), state-dict-compatible for
checkpoint conversion (utils/checkpoint_convert.convert_r2_rtdetr):

* every block ends ``act(project + skip)`` with a PARAMETERIZED skip when
  shape changes (1x1 conv+BN at stride 1; depthwise-3x3-s2+BN [+1x1+BN when
  channels change] at stride 2) — unlike the paper's identity-only residual;
* squeeze-excite runs conv-BN-relu / conv / hardsigmoid on the EXPANDED
  depthwise output (reduction max(exp//4, 8), conv biases off);
* the expand conv exists even when exp == in (block 0);
* the three feature levels are NOT bneck taps: level 0/1 come from a side
  branch that bilinearly resizes the stem output to input/4 (the reference
  hardcodes (64,64) for its 256 input, R2 mobilenetv3.py:219) then applies
  two stride-2 3x3 convs (16->128->256; the Large variant wraps them in
  BN+hardswish, the Small variant leaves them RAW), and level 2 is the
  bneck tail through a 1x1 512-channel conv.

Module/parameter names mirror the torch attribute names (conv1/bn1,
Conv1/Bn1, bneck_{i}, skip_{j}, se/se_{j}) so conversion is a mechanical
path rewrite. The classifier tail (gap/linear3/bn3/drop) is dead code in
the reference's detection forward and is not reproduced.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import apply_norm


def _hswish(x):
    return x * nn.relu6(x + 3.0) / 6.0


def _hsigmoid(x):
    return nn.relu6(x + 3.0) / 6.0


class SeModule(nn.Module):
    """R2 mobilenetv3 SeModule (conv-BN-relu / conv / hardsigmoid,
    reduction max(in//4, 8), R2/nn/backbone/mobilenetv3.py:28-42)."""

    in_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        expand = max(self.in_size // 4, 8)
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(expand, (1, 1), use_bias=False, dtype=self.dtype,
                    name="se_1")(s)
        s = apply_norm("bn", expand, "se_2", s, train, self.dtype)
        s = nn.relu(s)
        s = nn.Conv(self.in_size, (1, 1), use_bias=False, dtype=self.dtype,
                    name="se_4")(s)
        return x * _hsigmoid(s)


class Block(nn.Module):
    """R2 mobilenetv3 Block (R2/nn/backbone/mobilenetv3.py:45-121):
    expand 1x1 (always) -> dw kxk -> SE(expanded) -> project 1x1, plus an
    always-taken residual whose skip path is parameterized on any
    stride/channel change; final activation applied AFTER the addition."""

    kernel: int
    in_size: int
    expand_size: int
    out_size: int
    use_hs: bool  # hardswish vs relu (the ``act`` ctor arg)
    use_se: bool
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = _hswish if self.use_hs else nn.relu
        out = nn.Conv(self.expand_size, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv1")(x)
        out = apply_norm("bn", self.expand_size, "bn1", out, train, self.dtype)
        out = act(out)
        out = nn.Conv(
            self.expand_size, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=self.kernel // 2,
            feature_group_count=self.expand_size,
            use_bias=False, dtype=self.dtype, name="conv2",
        )(out)
        out = apply_norm("bn", self.expand_size, "bn2", out, train, self.dtype)
        out = act(out)
        if self.use_se:
            out = SeModule(self.expand_size, dtype=self.dtype, name="se")(
                out, train)
        out = nn.Conv(self.out_size, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv3")(out)
        out = apply_norm("bn", self.out_size, "bn3", out, train, self.dtype)

        skip = x
        if self.stride == 1 and self.in_size != self.out_size:
            skip = nn.Conv(self.out_size, (1, 1), use_bias=False,
                           dtype=self.dtype, name="skip_0")(skip)
            skip = apply_norm("bn", self.out_size, "skip_1", skip, train,
                              self.dtype)
        elif self.stride == 2:
            skip = nn.Conv(
                self.in_size, (3, 3), strides=(2, 2), padding=1,
                feature_group_count=self.in_size, use_bias=False,
                dtype=self.dtype, name="skip_0",
            )(skip)
            skip = apply_norm("bn", self.in_size, "skip_1", skip, train,
                              self.dtype)
            if self.in_size != self.out_size:
                skip = nn.Conv(self.out_size, (1, 1), use_bias=True,
                               dtype=self.dtype, name="skip_2")(skip)
                skip = apply_norm("bn", self.out_size, "skip_3", skip, train,
                                  self.dtype)
        return act(out + skip)


# (kernel, in, expand, out, hs, se, stride) — R2 mobilenetv3.py:148-164
_LARGE = [
    (3, 16, 16, 16, 0, 0, 1),
    (3, 16, 64, 24, 0, 0, 2),
    (3, 24, 72, 24, 0, 0, 1),
    (5, 24, 72, 40, 0, 1, 2),
    (5, 40, 120, 40, 0, 1, 1),
    (5, 40, 120, 40, 0, 1, 1),
    (3, 40, 240, 80, 1, 0, 2),
    (3, 80, 200, 80, 1, 0, 1),
    (3, 80, 184, 80, 1, 0, 1),
    (3, 80, 184, 80, 1, 0, 1),
    (3, 80, 480, 112, 1, 1, 1),
    (3, 112, 672, 112, 1, 1, 1),
    (5, 112, 672, 160, 1, 1, 2),
    (5, 160, 672, 160, 1, 1, 1),
    (5, 160, 960, 160, 1, 1, 1),
]

# R2 mobilenetv3.py:248-260
_SMALL = [
    (3, 16, 16, 16, 0, 1, 2),
    (3, 16, 72, 24, 0, 0, 2),
    (3, 24, 88, 24, 0, 0, 1),
    (5, 24, 96, 40, 1, 1, 2),
    (5, 40, 240, 40, 1, 1, 1),
    (5, 40, 240, 40, 1, 1, 1),
    (5, 40, 120, 48, 1, 1, 1),
    (5, 48, 144, 48, 1, 1, 1),
    (5, 48, 288, 96, 1, 1, 2),
    (5, 96, 576, 96, 1, 1, 1),
    (5, 96, 576, 96, 1, 1, 1),
]


class MobileNetV3(nn.Module):
    """Reference-variant MobileNetV3 emitting [input/8 (128ch),
    input/16 (256ch), input/32 (512ch)] — the side-branch + bneck-tail
    pyramid of R2/nn/backbone/mobilenetv3.py:208-228 (Large) / 302-324
    (Small). The reference hardcodes the branch resize to (64, 64) for its
    256 input; here it is input/4, identical at 256."""

    mode: str = "large"
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> Sequence[int]:
        return [128, 256, 512]

    @nn.compact
    def __call__(self, x, train: bool = False):
        large = self.mode == "large"
        cfg = _LARGE if large else _SMALL
        out = nn.Conv(16, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                      dtype=self.dtype, name="conv1")(x)
        out = apply_norm("bn", 16, "bn1", out, train, self.dtype)
        out = _hswish(out)

        from ..ops.image_warp import resize_bilinear_torch

        # torch F.interpolate without antialias (jax.image.resize
        # antialiases on downscale and diverges)
        b = resize_bilinear_torch(out, x.shape[1] // 4, x.shape[2] // 4)
        b = nn.Conv(128, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, name="Conv1")(b)
        if large:
            b = apply_norm("bn", 128, "Bn1", b, train, self.dtype)
            b = _hswish(b)
        c = nn.Conv(256, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, name="Conv2")(b)
        if large:
            c = apply_norm("bn", 256, "Bn2", c, train, self.dtype)
            c = _hswish(c)

        for i, (k, cin, exp, cout, hs, se, s) in enumerate(cfg):
            out = Block(kernel=k, in_size=cin, expand_size=exp, out_size=cout,
                        use_hs=bool(hs), use_se=bool(se), stride=s,
                        dtype=self.dtype, name=f"bneck_{i}")(out, train)

        out = nn.Conv(512, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv2")(out)
        out = apply_norm("bn", 512, "bn2", out, train, self.dtype)
        out = _hswish(out)
        return [b, c, out]
