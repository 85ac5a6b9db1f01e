"""Shared neural-net building blocks (flax.linen, NHWC, bf16-friendly).

Norm options mirror the reference's build_batchnorm selector
(R1/models/backbone.py:173-181): frozen_bn / bn / sync_bn / group_bn.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn


class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed statistics and affine parameters.

    Equivalent to the reference FrozenBatchNorm2d (R1/models/backbone.py:18-54):
    y = (x - mean) * rsqrt(var + eps) * weight + bias, with all four tensors
    loaded from a checkpoint and never updated. Stats live in the
    "batch_stats" collection so checkpoint converters can fill them.
    """

    features: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # stop_gradient enforces the frozen contract: in torch these are
        # BUFFERS (absent from named_parameters, never optimized,
        # R1/models/backbone.py:18-54); they stay in the params collection
        # here only so checkpoint converters can map .weight/.bias
        scale = jax.lax.stop_gradient(
            self.param("scale", nn.initializers.ones, (self.features,))
        )
        bias = jax.lax.stop_gradient(
            self.param("bias", nn.initializers.zeros, (self.features,))
        )
        if self.is_initializing():
            # Marker collection (init-time only, never carried into apply):
            # lets the optimizer identify these buffer-like params and
            # exclude them from updates entirely — in torch they are
            # buffers, so weight decay never touches them either
            # (train/state.frozen_param_prefixes).
            self.variable(
                "frozen_marker", "affine", lambda: jnp.zeros((), jnp.int32)
            )
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,))
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,))
        )
        inv = jnp.reciprocal(jnp.sqrt(var.value + self.eps))
        mult = (scale * inv).astype(self.dtype)
        shift = (bias - mean.value * scale * inv).astype(self.dtype)
        return x * mult + shift


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch running-statistics semantics.

    flax ``nn.BatchNorm`` blends the BIASED batch variance into the running
    average; torch ``nn.BatchNorm2d`` stores the UNBIASED one
    (``var * n / (n - 1)``, n = elements per channel — see torch
    functional.batch_norm). Normalization itself uses the biased variance
    in both frameworks, so train-mode forwards agree either way — but the
    running stats a checkpoint carries into eval would drift by n/(n-1)
    (14% at the 2x2-spatial deepest level of a batch-2 run). Verified
    head-to-head in tests/test_training_dynamics_parity.py.

    Variable/param naming matches flax BatchNorm ('mean'/'var',
    'scale'/'bias') so checkpoint converters are unaffected.

    ``axis_name``: reduce batch statistics over a bound mesh axis (the
    SyncBatchNorm contract, R2/src/misc/dist.py:83 sync_bn conversion);
    n then counts the GLOBAL batch, like torch SyncBatchNorm.
    """

    features: int
    momentum: float = 0.9  # retention factor == 1 - torch momentum (0.1)
    eps: float = 1e-5
    dtype: Any = jnp.float32
    axis_name: Any = None

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32),
        )
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32),
        )
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            stat_dtype = jnp.promote_types(x.dtype, jnp.float32)
            xs = x.astype(stat_dtype)
            axes = tuple(range(x.ndim - 1))
            n = x.size // x.shape[-1]
            mean = jnp.mean(xs, axis=axes)
            mean2 = jnp.mean(jnp.square(xs), axis=axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
                n = n * jax.lax.psum(1, self.axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing() and self.is_mutable_collection(
                    "batch_stats"):
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                # torch stores the unbiased variance in the running stat
                unbiased = var * (n / max(n - 1, 1))
                ra_var.value = m * ra_var.value + (1.0 - m) * unbiased
        inv = jax.lax.rsqrt(var + self.eps) * scale
        y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype)
        return (y + bias.astype(x.dtype)).astype(self.dtype)


def _axis_bound(axis_name: str) -> bool:
    """True when a mesh axis of this name is bound (inside shard_map/pmap)."""
    try:
        import jax

        jax.lax.axis_index(axis_name)
        return True
    except NameError:
        return False
    except Exception:
        return False


def apply_norm(kind: str, features: int, name: str, x, train: bool,
               dtype=jnp.float32, data_axis: str = "data"):
    """Build-and-apply one norm layer inside an @nn.compact body.

    'sync_bn' reduces batch stats over the mesh data axis (psum under
    shard_map/pmap) — the XLA-native SyncBatchNorm equivalent.
    """
    if kind == "frozen_bn":
        return FrozenBatchNorm(features, dtype=dtype, name=name)(x)
    if kind in ("bn", "sync_bn"):
        # Under jit-SPMD the batch axis is sharded across the mesh and XLA
        # reduces batch statistics globally, so plain BN IS SyncBatchNorm;
        # an explicit axis_name is only needed (and only valid) inside
        # shard_map/pmap where the axis is bound.
        use_axis = kind == "sync_bn" and data_axis is not None and _axis_bound(
            data_axis
        )
        return TorchBatchNorm(
            features=x.shape[-1],
            momentum=0.9,
            eps=1e-5,
            dtype=dtype,
            axis_name=data_axis if use_axis else None,
            name=name,
        )(x, use_running_average=not train)
    if kind == "group_bn":
        return nn.GroupNorm(num_groups=32, dtype=dtype, name=name)(x)
    raise ValueError(f"unknown norm kind: {kind}")


class MLP(nn.Module):
    """DETR-style MLP head: (num_layers-1) x [Linear+ReLU] + Linear.

    Reference: R1/models/detr_speed.py:16-29.
    """

    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"layers_{i}")(x)
            x = nn.relu(x)
        x = nn.Dense(
            self.output_dim, dtype=self.dtype, name=f"layers_{self.num_layers - 1}"
        )(x)
        return x


def get_activation(name: str) -> Callable:
    return {
        "relu": nn.relu,
        "gelu": lambda x: nn.gelu(x, approximate=False),  # torch nn.GELU is erf-exact
        "silu": nn.silu,
        "swish": nn.silu,
    }[name]


def _act_scale_or_calibrate(mod: nn.Module, x, name: str = "act_amax"):
    """Static-PTQ hook shared by QConv/QDense (and the quantized attention
    core, which tracks one scale per q/k/v tensor via ``name``).

    Three modes, decided structurally (trace-time) from the ``quant``
    variable collection:
    * calibration pass (``apply(..., mutable=["quant"])``): track the
      running max|activation| into ``quant/act_amax`` and return None so
      this pass still quantizes dynamically;
    * calibrated inference (caller passes a ``quant`` collection, e.g.
      from utils.calibrate.calibrate_act_scales): return the static scale,
      eliminating the per-call max-reduction over the activation;
    * uncalibrated (no ``quant`` in variables): return None -> dynamic.
    """
    if mod.is_mutable_collection("quant") and not mod.is_initializing():
        amax = mod.variable("quant", name,
                            lambda: jnp.zeros((), jnp.float32))
        amax.value = jnp.maximum(
            amax.value, jnp.max(jnp.abs(x.astype(jnp.float32)))
        )
        return None
    if mod.has_variable("quant", name):
        val = mod.get_variable("quant", name)
        return jnp.maximum(val, 1e-8) / 127.0
    return None


class QConv(nn.Module):
    """Drop-in nn.Conv replacement running on the int8 MXU path
    (ops/quantize.py): identical parameter contract (kernel HWIO +
    optional bias, lecun_normal init), weights and activations dynamically
    quantized inside the jit program. Eval-path deployment option — the
    TPU-native analogue of the reference's TensorRT int8 deployment.
    """

    features: int
    kernel_size: tuple
    strides: Any = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.quantize import int8_conv

        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features),
        )
        strides = self.strides
        if isinstance(strides, int):
            strides = (strides, strides)
        padding = self.padding
        if isinstance(padding, int):
            padding = ((padding, padding), (padding, padding))
        y = int8_conv(x, kernel, strides, padding, out_dtype=self.dtype,
                      act_scale=_act_scale_or_calibrate(self, x))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class QDenseGeneral(nn.Module):
    """Drop-in nn.DenseGeneral replacement on the int8 MXU path for the two
    contracts the attention block uses: ``features=(H, D), axis=-1``
    (q/k/v in-projection, kernel (in, H, D)) and ``features=d,
    axis=(-2, -1)`` (out-projection, kernel (H, D, d)). Parameter shapes
    and init statistics match flax DenseGeneral (kernel drawn as the
    flattened 2-D lecun_normal matrix, then reshaped), so checkpoints are
    interchangeable with the float model."""

    features: Any
    axis: Any = -1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        import numpy as np

        from ..ops.quantize import int8_matmul

        feats = (self.features if isinstance(self.features, tuple)
                 else (self.features,))
        axes = self.axis if isinstance(self.axis, tuple) else (self.axis,)
        assert all(a < 0 for a in axes) and list(axes) == sorted(axes), (
            "QDenseGeneral supports trailing contraction axes only"
        )
        in_shape = x.shape[-len(axes):]
        n_in = int(np.prod(in_shape))
        n_out = int(np.prod(feats))

        def kernel_init(key, shape, dtype=jnp.float32):
            flat = nn.initializers.lecun_normal()(key, (n_in, n_out), dtype)
            return flat.reshape(shape)

        kernel = self.param("kernel", kernel_init, in_shape + feats)
        lead = x.shape[: x.ndim - len(axes)]
        y = int8_matmul(
            x.reshape(-1, n_in), kernel.reshape(n_in, n_out),
            out_dtype=self.dtype,
            act_scale=_act_scale_or_calibrate(self, x),
        )
        y = y.reshape(*lead, *feats)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, feats)
            y = y + bias.astype(self.dtype)
        return y


class QDense(nn.Module):
    """Drop-in nn.Dense replacement on the int8 MXU path (same parameter
    contract: kernel (in, out) + bias)."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.quantize import int8_matmul

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
        )
        lead = x.shape[:-1]
        y = int8_matmul(x.reshape(-1, x.shape[-1]), kernel,
                        out_dtype=self.dtype,
                        act_scale=_act_scale_or_calibrate(self, x))
        y = y.reshape(*lead, self.features)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            y = y + bias.astype(self.dtype)
        return y
