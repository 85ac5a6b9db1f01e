"""Static-PTQ calibration: collect per-site activation ranges.

The TPU-native analogue of TensorRT's int8 calibration pass (the
reference's deployment story is export_onnx -> TensorRT, R2/tools/
export_onnx.py): run a handful of representative batches through the
quantized model with the ``quant`` variable collection mutable; every
QConv/QDense records its running max|activation| (models/layers.py
``_act_scale_or_calibrate``). Feeding the resulting collection back at
inference (``make_eval_step(..., quant=...)``) replaces each dynamic
per-batch max reduction with a constant scale.
"""
from __future__ import annotations

import jax


def calibrate_act_scales(model, variables, batches, **apply_kwargs):
    """Run ``batches`` through ``model`` and return the calibrated
    ``quant`` collection (running max over all batches).

    ``variables``: the usual {"params": ..., "batch_stats": ...} trees.
    ``batches``: iterable of model inputs (e.g. warped f32 crop batches).
    Extra ``apply_kwargs`` are forwarded to ``model.apply`` (e.g.
    ``train=False``).

    The pass runs under jit: eager op-by-op execution would materialize
    every attention intermediate (an f32 (B, H, T, T) score tensor is
    ~10 GB at batch 256 / T=784 — more HBM than the chip has), while the
    compiled program fuses them away. Two traces happen (without / with
    an existing ``quant`` collection); both reuse the model's weights.
    """

    @jax.jit
    def step(vs, x):
        return model.apply(vs, x, mutable=["quant"], **apply_kwargs)[1][
            "quant"
        ]

    quant = None
    for x in batches:
        vs = dict(variables)
        if quant is not None:
            vs["quant"] = quant
        quant = step(vs, x)
    if quant is None:
        raise ValueError("calibrate_act_scales: got no batches")
    return quant
