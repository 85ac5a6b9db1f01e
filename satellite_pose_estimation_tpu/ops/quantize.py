"""Dynamic int8 quantized matmul/conv for the eval path.

The v5e MXU runs int8 at 2x the bf16 rate; the flagship eval forward is
conv/matmul-bound outside attention, so a post-training dynamic-quantization
path is the TPU-native analogue of the reference's TensorRT deployment story
(R2 export_onnx -> TensorRT int8). No calibration pass is needed:

* weights — symmetric per-output-channel int8, quantized inside the jit
  program from the SAME parameter tree the bf16 path uses (one cheap pass
  over weight bytes; any trained checkpoint works unchanged);
* activations — symmetric per-tensor dynamic int8 (scale = max|x|/127
  computed on device per batch).

Accuracy is guarded by tests/test_quantize.py (op-level error bounds and
model-level keypoint drift) and the synthetic-selfcheck A/B.
"""
from __future__ import annotations

import threading
from contextlib import contextmanager

import jax
import jax.numpy as jnp

_qstate = threading.local()


@contextmanager
def quantized_inference():
    """Trace-time context: conv/norm wrappers (PResNet ConvNorm, hybrid
    encoder ConvNormLayer) route their eval-path convolutions through the
    int8 QConv while a model is TRACED inside this context — the
    non-invasive deployment toggle for composite models whose configs have
    no quantize flag (the DETR flagship instead uses its explicit
    ``quantize_int8`` config). Training passes are never quantized."""
    prev = getattr(_qstate, "on", False)
    _qstate.on = True
    try:
        yield
    finally:
        _qstate.on = prev


def quantization_active() -> bool:
    return getattr(_qstate, "on", False)


def quant_scope(name: str) -> bool:
    """Trace-time filter for which op families run int8 under the quant
    toggles: ``conv`` (backbone/encoder convs), ``ffn`` (transformer
    FFNs), ``attn_proj`` (q/k/v/out projections), ``dec`` (DETR decoder).
    ``SPE_INT8_SCOPE`` (comma list, default ``conv,ffn``) selects the
    deployment preset; the default is the measured-fastest set (PERF.md:
    attn_proj/dec measured a net LOSS at batch 256 @224 on v5e)."""
    import os

    scope = os.environ.get("SPE_INT8_SCOPE", "conv,ffn")
    return name in {s.strip() for s in scope.split(",")}


def _act_quantize(x, act_scale=None):
    """Per-tensor symmetric quantization. Returns (int8, scale).

    ``act_scale`` (a precomputed scalar, e.g. calibrated amax/127) skips
    the dynamic max reduction — the reduction is the expensive part of
    dynamic quantization: it is a full pass over the activation with a
    fusion barrier, while the scale/round/clip pass fuses into the
    producing op."""
    if act_scale is None:
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
        act_scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / act_scale), -127, 127)
    return q.astype(jnp.int8), act_scale


def _weight_quantize(w, out_axis):
    """Per-output-channel symmetric quantization of a float kernel."""
    w = w.astype(jnp.float32)
    red = tuple(i for i in range(w.ndim) if i != out_axis)
    amax = jnp.max(jnp.abs(w), axis=red, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.reshape(w.shape[out_axis])


def int8_matmul(x, kernel, out_dtype=None, act_scale=None):
    """x (..., K) @ kernel (K, N) via the int8 MXU path.

    Both operands are quantized symmetrically (activations dynamically, or
    with a calibrated static ``act_scale``); the int32 accumulator is
    rescaled back to float. Error vs the f32 matmul is bounded by the
    per-tensor activation step (~max|x|/127 per element).
    """
    out_dtype = out_dtype or x.dtype
    xq, xs = _act_quantize(x, act_scale)
    wq, ws = _weight_quantize(kernel, out_axis=1)
    y = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * (xs * ws)).astype(out_dtype)


def int8_attention_core(qh, kh, vh, sm_scale, act_scales=(None, None, None)):
    """softmax(q @ k^T * sm_scale) @ v with both matmuls on the int8 MXU.

    ``qh/kh/vh``: (B, H, T, D) head tensors. ``act_scales``: optional
    calibrated per-tensor scales for q/k/v (None -> dynamic max).

    Numerics: the (T, T) score matmul accumulates in int32 (exact given
    the int8 inputs) and is rescaled into the INPUT dtype for the softmax
    — bf16 on the deployment path, the same score precision the float
    core uses (materializing int32+f32 score tensors instead costs ~10 GB
    at batch 256 / T=784 and OOMs a v5e chip). The probabilities are
    quantized with the FIXED scale 1/127 (softmax output is bounded in
    [0, 1] — no reduction needed), so the AV matmul runs int8 x int8 with
    its full T-deep contraction on the int8 MXU. Error vs the bf16 core
    is dominated by the +-0.5/127 probability rounding, bounded by
    tests/test_quantize.py and the PTQ selfcheck A/B.
    """
    sq, sk, sv = act_scales
    qq, qs = _act_quantize(qh, sq)
    kq, ks = _act_quantize(kh, sk)
    vq, vs = _act_quantize(vh, sv)
    s = jax.lax.dot_general(
        qq, kq, (((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32,
    )  # (B, H, Tq, Tk) int32, exact
    # rescale fuses into the dot epilogue; only a qh.dtype score tensor is
    # materialized (softmax internals fuse on top of it)
    p = jax.nn.softmax(
        (s.astype(jnp.float32) * (qs * ks * sm_scale)).astype(qh.dtype),
        axis=-1,
    )
    pq = jnp.round(p * 127.0).astype(jnp.int8)  # fixed scale: p in [0, 1]
    o = jax.lax.dot_general(
        pq, vq, (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32,
    )  # (B, H, Tq, D)
    return (o.astype(jnp.float32) * (vs / 127.0)).astype(qh.dtype)


def int8_conv(x, kernel, strides=(1, 1), padding="SAME", out_dtype=None,
              act_scale=None):
    """NHWC x (B,H,W,Cin), HWIO kernel -> int8 convolution with float
    rescale. Falls back through XLA's integer conv lowering."""
    out_dtype = out_dtype or x.dtype
    xq, xs = _act_quantize(x, act_scale)
    wq, ws = _weight_quantize(kernel, out_axis=3)
    y = jax.lax.conv_general_dilated(
        xq, wq, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * (xs * ws)).astype(out_dtype)
