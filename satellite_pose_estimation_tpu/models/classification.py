"""Classification sanity-check task (R2/nn/arch/classification.py:10-41):
Classification(backbone, head) with ClassHead = global-average-pool ->
linear, plus an MResNet CIFAR-style trunk (R2/nn/backbone/test_resnet.py).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import apply_norm


class MResNetBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = apply_norm("bn", self.planes, "bn1", y, train, self.dtype)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = apply_norm("bn", self.planes, "bn2", y, train, self.dtype)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="short")(x)
            identity = apply_norm("bn", self.planes, "short_bn", identity,
                                  train, self.dtype)
        return nn.relu(y + identity)


class MResNet(nn.Module):
    """CIFAR-style small resnet trunk."""

    layers: tuple = (2, 2, 2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(16, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="stem")(x)
        x = apply_norm("bn", 16, "stem_bn", x, train, self.dtype)
        x = nn.relu(x)
        planes = 16
        for stage, count in enumerate(self.layers):
            for b in range(count):
                x = MResNetBlock(
                    planes, stride=2 if (b == 0 and stage > 0) else 1,
                    dtype=self.dtype, name=f"stage{stage}_{b}",
                )(x, train)
            planes *= 2
        return x


class ClassHead(nn.Module):
    num_classes: int = 10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)


class Classification(nn.Module):
    num_classes: int = 10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = MResNet(dtype=self.dtype, name="backbone")(x, train)
        return ClassHead(self.num_classes, self.dtype, name="head")(feat)
