"""PResNet — ResNet-vd backbone of the RT-DETR pipeline (flax, NHWC).

Capability parity with R2/nn/backbone/presnet.py:152-265:
* variant 'd': 3x3 stem triplet (conv1_1/2/3) instead of a 7x7 conv, and
  avgpool(ceil)+1x1-conv shortcuts on stride-2 blocks;
* BottleNeck places the stride on the 3x3 (variant b/d), BasicBlock on the
  first 3x3;
* return_idx selects pyramid levels (strides [4, 8, 16, 32]);
* freeze_norm -> FrozenBatchNorm everywhere; freeze_at handled at the
  optimizer level (zero lr group) rather than by requires_grad.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import apply_norm, get_activation

_CFG = {
    18: ([2, 2, 2, 2], 1),
    34: ([3, 4, 6, 3], 1),
    50: ([3, 4, 6, 3], 4),
    101: ([3, 4, 23, 3], 4),
}


class ConvNorm(nn.Module):
    ch_out: int
    kernel: int
    stride: int = 1
    act: str | None = None
    norm: str = "frozen_bn"
    dtype: Any = jnp.float32
    s2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if (self.s2d and self.stride == 2 and x.shape[-1] == 3
                and self.kernel % 2 == 1
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
            # 3-channel stride-2 stem: space-to-depth form (same params,
            # same outputs, ~8x on the MXU — see models/resnet.py)
            from .resnet import SpaceToDepthStem

            x = SpaceToDepthStem(self.ch_out, self.kernel,
                                 dtype=self.dtype, name="conv")(x)
        else:
            from ..ops.quantize import quantization_active

            if quantization_active() and not train:
                from .layers import QConv as Conv
            else:
                Conv = nn.Conv
            x = Conv(
                self.ch_out,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=(self.kernel - 1) // 2,
                use_bias=False,
                dtype=self.dtype,
                name="conv",
            )(x)
        x = apply_norm(self.norm, self.ch_out, "norm", x, train, self.dtype)
        if self.act:
            x = get_activation(self.act)(x)
        return x


def _avgpool_ceil2(x):
    """AvgPool2d(2, 2, ceil_mode=True) equivalent in NHWC."""
    b, h, w, c = x.shape
    pad_h = h % 2
    pad_w = w % 2
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="edge")
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


class PBasicBlock(nn.Module):
    ch_out: int
    stride: int
    shortcut: bool
    act: str = "relu"
    variant: str = "d"
    norm: str = "frozen_bn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = ConvNorm(self.ch_out, 3, self.stride, self.act, self.norm,
                       self.dtype, name="branch2a")(x, train)
        out = ConvNorm(self.ch_out, 3, 1, None, self.norm, self.dtype,
                       name="branch2b")(out, train)
        if self.shortcut:
            short = x
        elif self.variant == "d" and self.stride == 2:
            short = ConvNorm(self.ch_out, 1, 1, None, self.norm, self.dtype,
                             name="short_conv")(_avgpool_ceil2(x), train)
        else:
            short = ConvNorm(self.ch_out, 1, self.stride, None, self.norm,
                             self.dtype, name="short_conv")(x, train)
        return get_activation(self.act)(out + short)


class PBottleNeck(nn.Module):
    ch_out: int
    stride: int
    shortcut: bool
    act: str = "relu"
    variant: str = "d"
    norm: str = "frozen_bn"
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        s1, s2 = (self.stride, 1) if self.variant == "a" else (1, self.stride)
        wide = self.ch_out * self.expansion
        out = ConvNorm(self.ch_out, 1, s1, self.act, self.norm, self.dtype,
                       name="branch2a")(x, train)
        out = ConvNorm(self.ch_out, 3, s2, self.act, self.norm, self.dtype,
                       name="branch2b")(out, train)
        out = ConvNorm(wide, 1, 1, None, self.norm, self.dtype,
                       name="branch2c")(out, train)
        if self.shortcut:
            short = x
        elif self.variant == "d" and self.stride == 2:
            short = ConvNorm(wide, 1, 1, None, self.norm, self.dtype,
                             name="short_conv")(_avgpool_ceil2(x), train)
        else:
            short = ConvNorm(wide, 1, self.stride, None, self.norm, self.dtype,
                             name="short_conv")(x, train)
        return get_activation(self.act)(out + short)


class PResNet(nn.Module):
    depth: int = 50
    variant: str = "d"
    num_stages: int = 4
    return_idx: Sequence[int] = (1, 2, 3)
    act: str = "relu"
    freeze_norm: bool = True
    dtype: Any = jnp.float32
    s2d_stem: bool = True  # space-to-depth first conv (models/resnet.py)

    @property
    def out_channels(self):
        _, expansion = _CFG[self.depth]
        return [64 * (2 ** i) * expansion for i in self.return_idx]

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_nums, expansion = _CFG[self.depth]
        norm = "frozen_bn" if self.freeze_norm else "bn"
        block_cls = PBottleNeck if self.depth >= 50 else PBasicBlock

        if self.variant in ("c", "d"):
            x = ConvNorm(32, 3, 2, self.act, norm, self.dtype,
                         s2d=self.s2d_stem, name="conv1_1")(x, train)
            x = ConvNorm(32, 3, 1, self.act, norm, self.dtype,
                         name="conv1_2")(x, train)
            x = ConvNorm(64, 3, 1, self.act, norm, self.dtype,
                         name="conv1_3")(x, train)
        else:
            x = ConvNorm(64, 7, 2, self.act, norm, self.dtype,
                         s2d=self.s2d_stem, name="conv1_1")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        ch_out_list = [64, 128, 256, 512]
        for i in range(self.num_stages):
            for b in range(block_nums[i]):
                x = block_cls(
                    ch_out=ch_out_list[i],
                    stride=2 if (b == 0 and i != 0) else 1,
                    shortcut=(b != 0),
                    act=self.act,
                    variant=self.variant,
                    norm=norm,
                    dtype=self.dtype,
                    name=f"res{i + 2}_{b}",
                )(x, train)
            if i in self.return_idx:
                outs.append(x)
        return outs
