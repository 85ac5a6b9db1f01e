"""ResNet backbones (NHWC, flax) with the reference's tap points.

Capability parity targets:
* ``ResNet`` taps layer3 (stride 16, 1024ch for resnet50; 256ch for
  resnet18/34) like the reference Backbone (R1/models/backbone.py:88-102,
  return_layers={'layer3'} at :71).
* ``Backbone8s`` fuses layer2 (s8) + bilinearly-upsampled layer3 (s16) with
  lateral convs into a 512ch stride-8 map (R1/models/backbone.py:105-149).

Structure follows torchvision resnet naming (conv1/bn1/layerN_M) so a
checkpoint converter can map pretrained torch weights 1:1.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import QConv, apply_norm


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    norm: str = "frozen_bn"
    dtype: Any = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        nn_Conv = QConv if self.quant else nn.Conv
        identity = x
        out = nn_Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = apply_norm(self.norm, self.planes, "bn1", out, train, self.dtype)
        out = nn.relu(out)
        out = nn_Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = apply_norm(self.norm, self.planes, "bn2", out, train, self.dtype)
        if self.downsample:
            identity = nn_Conv(self.planes, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = apply_norm(
                self.norm, self.planes, "downsample_bn", identity, train,
                self.dtype)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    norm: str = "frozen_bn"
    dtype: Any = jnp.float32
    expansion: int = 4
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        nn_Conv = QConv if self.quant else nn.Conv
        identity = x
        wide = self.planes * self.expansion
        out = nn_Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = apply_norm(self.norm, self.planes, "bn1", out, train, self.dtype)
        out = nn.relu(out)
        out = nn_Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=1, use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = apply_norm(self.norm, self.planes, "bn2", out, train, self.dtype)
        out = nn.relu(out)
        out = nn_Conv(wide, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv3")(out)
        out = apply_norm(self.norm, wide, "bn3", out, train, self.dtype)
        if self.downsample:
            identity = nn_Conv(wide, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = apply_norm(
                self.norm, wide, "downsample_bn", identity, train, self.dtype)
        return nn.relu(out + identity)


_ARCHS = {
    "resnet18": (BasicBlock, [2, 2, 2, 2], 1),
    "resnet34": (BasicBlock, [3, 4, 6, 3], 1),
    "resnet50": (Bottleneck, [3, 4, 6, 3], 4),
    "resnet101": (Bottleneck, [3, 4, 23, 3], 4),
}


class SpaceToDepthStem(nn.Module):
    """A stride-2 stem conv on a 3-channel input, computed as
    space-to-depth(2) + stride-1 conv.

    A 3-input-channel conv runs the MXU contraction at 3/128 lanes; the
    s2d form contracts over (k+1)^2/4 * 12 channels with far better tiling
    — measured 45.4 -> 5.7 ms for the 7x7 stem STANDALONE at batch 256
    @224 on v5e. In the full fused eval program the end-to-end rate is
    unchanged (XLA's layout assignment already avoids the pathological
    standalone schedule); the s2d form makes the stem cost robust to
    surrounding-program layout rather than dependent on it (see PERF.md).
    The parameter is STORED in the torchvision shape ((k, k, 3, F) under
    <name>/kernel — checkpoint-converter compatible) and remapped to the
    ((k+1)/2+?, ...) s2d form inside the call; outputs equal the direct
    SAME-padded stride-2 conv to f32 rounding. Requires odd k and even
    input H/W (callers fall back to the direct conv otherwise)."""

    features: int = 64
    kernel_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        K = k + 1  # even padded kernel extent; cell kernel K//2
        pad = (k - 1) // 2
        pl_, pr_ = pad + 1, K - pad - 1
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, 3, self.features),
        )
        kK = jnp.zeros((K, K, 3, self.features), self.dtype)
        kK = kK.at[1:, 1:].set(kernel.astype(self.dtype))
        Kc = K // 2
        ks2d = kK.reshape(Kc, 2, Kc, 2, 3, self.features)
        ks2d = ks2d.transpose(0, 2, 1, 3, 4, 5).reshape(
            Kc, Kc, 12, self.features
        )
        B, H, W, _ = x.shape
        xp = jnp.pad(
            x.astype(self.dtype),
            ((0, 0), (pl_, pr_), (pl_, pr_), (0, 0)),
        )
        hc, wc = (H + pl_ + pr_) // 2, (W + pl_ + pr_) // 2
        xs2 = xp.reshape(B, hc, 2, wc, 2, 3).transpose(
            0, 1, 3, 2, 4, 5
        ).reshape(B, hc, wc, 12)
        y = jax.lax.conv_general_dilated(
            xs2, ks2d, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y[:, : H // 2, : W // 2]


class ResNet(nn.Module):
    """torchvision-style ResNet trunk; returns requested layer taps.

    ``taps``: which of layer1..layer4 outputs to return, e.g. (2, 3) for the
    stride-8 and stride-16 maps.
    """

    arch: str = "resnet50"
    taps: Sequence[int] = (3,)
    norm: str = "frozen_bn"
    dtype: Any = jnp.float32
    quant: bool = False
    s2d_stem: bool = True  # see SpaceToDepthStem; auto-falls back on odd HW

    @nn.compact
    def __call__(self, x, train: bool = False):
        nn_Conv = QConv if self.quant else nn.Conv
        block_cls, layout, _ = _ARCHS[self.arch]
        if (self.s2d_stem and not self.quant
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
            x = SpaceToDepthStem(64, dtype=self.dtype, name="conv1")(x)
        else:
            x = nn_Conv(64, (7, 7), strides=(2, 2), padding=3,
                        use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = apply_norm(self.norm, 64, "bn1", x, train, self.dtype)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outputs = {}
        planes = 64
        max_tap = max(self.taps)
        for stage in range(max_tap):
            stride = 1 if stage == 0 else 2
            for b in range(layout[stage]):
                x = block_cls(
                    planes=planes,
                    stride=stride if b == 0 else 1,
                    downsample=(b == 0),
                    norm=self.norm,
                    dtype=self.dtype,
                    quant=self.quant,
                    name=f"layer{stage + 1}_{b}",
                )(x, train)
            outputs[stage + 1] = x
            planes *= 2
        return [outputs[t] for t in self.taps]

    @staticmethod
    def tap_channels(arch: str, tap: int) -> int:
        _, _, expansion = _ARCHS[arch]
        return 64 * (2 ** (tap - 1)) * expansion


class Backbone8s(nn.Module):
    """ResNet50 stride-8 fusion backbone (R1/models/backbone.py:105-149):
    layer2 (s8, 512ch) + bilinear-2x-upsampled layer3 (s16, 1024ch), lateral
    1x1/3x3 convs to 256ch each, concat, 3x3 output conv -> 512ch @ s8."""

    norm: str = "frozen_bn"
    dtype: Any = jnp.float32
    num_channels: int = 512
    quant: bool = False
    s2d_stem: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        nn_Conv = QConv if self.quant else nn.Conv
        xs8, xs16 = ResNet(
            arch="resnet50", taps=(2, 3), norm=self.norm, dtype=self.dtype,
            quant=self.quant, s2d_stem=self.s2d_stem, name="body",
        )(x, train)
        # torch UpsamplingBilinear2d = align_corners=True (jax.image.resize
        # 'bilinear' is half-pixel and diverges from the reference).
        from ..ops.image_warp import upsample_bilinear_align_corners

        up = upsample_bilinear_align_corners(xs16, 2).astype(self.dtype)
        l8 = nn_Conv(256, (1, 1), use_bias=False, dtype=self.dtype,
                     name="s8_latern")(xs8)
        l16 = nn_Conv(256, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                      name="s16_latern")(up)
        out = nn_Conv(512, (3, 3), padding=1, dtype=self.dtype,
                      name="output_conv")(jnp.concatenate([l8, l16], axis=-1))
        return [out]
