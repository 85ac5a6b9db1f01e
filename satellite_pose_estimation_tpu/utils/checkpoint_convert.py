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


_R2_RTDETR_SKIP = (
    "temper_param",            # declared on the composite but never used in
                               # forward (R2/src/zoo/rtdetr/rtdetr.py:34)
    "encoder.encoder_fusion_input",  # defined but never called
                               # (R2/src/zoo/rtdetr/hybrid_encoder.py)
    "decoder.anchors",         # eval_spatial_size buffer, regenerated here
    "decoder.valid_mask",
)

# R2 custom-MobileNetV3 backbone (R2/nn/backbone/mobilenetv3.py): flax
# module names mirror the torch attribute names, so only the Sequential
# indices need rewriting. The classification tail (linear3/bn3/gap/drop) is
# dead in the reference's detection forward and is dropped.
_R2_MOBILENET_RULES = (
    (r"^bneck\.(\d+)\.", r"bneck_\1."),
    (r"\bse\.se\.(\d)\.", r"se.se_\1."),
    (r"\bskip\.(\d)\.", r"skip_\1."),
)
_R2_MOBILENET_DEAD = ("backbone.linear3.", "backbone.bn3.")

# R2 GhostNetV2 backbone (R2/nn/backbone/ghostnetv2.py): Sequential indices
# -> our semantic module names. The dead classifier tail
# (global_pool/conv_head/classifier) is dropped.
_R2_GHOSTNET_RULES = (
    (r"^blocks\.9\.0\.conv\.", "blocks_9_0_conv."),
    (r"^blocks\.9\.0\.bn1\.", "blocks_9_0_bn1."),
    (r"^blocks\.(\d+)\.(\d+)\.", r"blocks_\1_\2."),
    (r"\b(ghost\d)\.primary_conv\.0\.", r"\1.primary_conv."),
    (r"\b(ghost\d)\.primary_conv\.1\.", r"\1.primary_bn."),
    (r"\b(ghost\d)\.cheap_operation\.0\.", r"\1.cheap_conv."),
    (r"\b(ghost\d)\.cheap_operation\.1\.", r"\1.cheap_bn."),
    (r"\bghost1\.short_conv\.0\.", "ghost1.short_conv."),
    (r"\bghost1\.short_conv\.1\.", "ghost1.short_bn."),
    (r"\bghost1\.short_conv\.2\.", "ghost1.dfc_h."),
    (r"\bghost1\.short_conv\.3\.", "ghost1.dfc_h_bn."),
    (r"\bghost1\.short_conv\.4\.", "ghost1.dfc_v."),
    (r"\bghost1\.short_conv\.5\.", "ghost1.dfc_v_bn."),
    (r"\bconv_dw\.", "dw_conv."),
    (r"\bbn_dw\.", "dw_bn."),
    (r"\bse\.conv_reduce\.", "se_reduce."),
    (r"\bse\.conv_expand\.", "se_expand."),
    (r"\bshortcut\.0\.", "short_dw."),
    (r"\bshortcut\.1\.", "short_dw_bn."),
    (r"\bshortcut\.2\.", "short_pw."),
    (r"\bshortcut\.3\.", "short_pw_bn."),
)
_R2_GHOSTNET_DEAD = ("backbone.conv_head.", "backbone.classifier.")

# ordered torch-module-path -> flax-module-path rewrites, per top section
_R2_BACKBONE_RULES = (
    (r"^conv1\.", ""),
    (r"^res_layers\.(\d+)\.blocks\.(\d+)\.",
     lambda m: f"res{int(m.group(1)) + 2}_{m.group(2)}."),
    (r"\bshort\.conv\.(conv|norm)\.", r"short_conv.\1."),
    (r"\bshort\.(conv|norm)\.", r"short_conv.\1."),
)
_R2_ENCODER_RULES = (
    (r"^input_proj\.(\d+)\.0\.", r"input_proj_\1_conv."),
    (r"^input_proj\.(\d+)\.1\.", r"input_proj_\1_norm."),
    (r"^encoder\.(\d+)\.layers\.(\d+)\.", r"encoder_\1_layer_\2."),
    (r"^(lateral_convs|fpn_blocks|pan_blocks|downsample_convs)\.(\d+)\.",
     r"\1_\2."),
    (r"\bbottlenecks\.(\d+)\.", r"bottlenecks_\1."),
)
_R2_DECODER_RULES = (
    (r"^input_proj\.(\d+)\.(conv|norm)\.", r"input_proj_\1_\2."),
    (r"^decoder\.layers\.(\d+)\.", r"decoder_layer_\1."),
    (r"^decoder\.sigma_embed\.(\d+)\.", r"sigma_embed_\1."),
    (r"^(dec_bbox_head|dec_score_head)\.(\d+)\.", r"\1_\2."),
    (r"^enc_output\.(\d+)\.", r"enc_output_\1."),
    (r"\blayers\.(\d+)\.", r"layers_\1."),
)


def convert_r2_rtdetr(state_dict: Dict[str, np.ndarray], nhead: int = 8):
    """R2 torch RTDETR (PResNet + HybridEncoder + RTDETRTransformer)
    state_dict -> (params, batch_stats) trees matching models.rtdetr.RTDETR.

    The reference composite registers its parts as ``backbone.`` /
    ``encoder.`` / ``decoder.`` (R2/src/zoo/rtdetr/rtdetr.py:28-32); our
    flax modules keep the same sub-module names, so conversion is a pure
    path rewrite plus the torch->flax tensor conventions:

    * conv (out,in,kh,kw) -> (kh,kw,in,out); linear (out,in) -> (in,out);
    * BatchNorm weight/bias -> params scale/bias, running stats ->
      batch_stats mean/var; LayerNorm weight -> scale;
    * nn.MultiheadAttention packed in_proj (3h,h) -> per-head DenseGeneral
      kernels (h, nhead, h//nhead) for mha_query/key/value, out_proj ->
      mha_out (nhead, h//nhead, h) — torch concatenates heads head-major so
      a plain reshape is exact;
    * nn.Embedding weights (tgt_embed / denoising_class_embed) copied
      untransposed to flax nn.Embed ``embedding`` leaves.

    Forward-parity tested against the live torch reference model in
    tests/test_rtdetr_torch_parity.py.
    """
    import re

    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value)

    def rewrite(rules, dotted):
        for pat, rep in rules:
            dotted = re.sub(pat, rep, dotted)
        return dotted

    mobilenet = any(k.startswith("backbone.bneck.") for k in state_dict)
    ghostnet = any(k.startswith("backbone.conv_stem.") for k in state_dict)
    backbone_rules = (_R2_MOBILENET_RULES if mobilenet else
                      _R2_GHOSTNET_RULES if ghostnet else _R2_BACKBONE_RULES)
    dead = (_R2_MOBILENET_DEAD if mobilenet else
            _R2_GHOSTNET_DEAD if ghostnet else ())
    mha_groups: dict = {}
    for key, val in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        if any(key == s or key.startswith(s + ".") for s in _R2_RTDETR_SKIP):
            continue
        if dead and key.startswith(dead):
            continue
        val = np.asarray(val)
        section, rest = key.split(".", 1)
        rules = {"backbone": backbone_rules,
                 "encoder": _R2_ENCODER_RULES,
                 "decoder": _R2_DECODER_RULES}[section]

        if ".self_attn." in "." + rest + ".":
            # collect the 4 tensors of each nn.MultiheadAttention
            mod, leaf = rest.split(".self_attn.", 1)
            mha_groups.setdefault((section, mod), {})[leaf] = val
            continue

        mod_path, leaf = rest.rsplit(".", 1)
        flax_mod = rewrite(rules, mod_path + ".").rstrip(".")
        path = (section, *flax_mod.split("."))
        if leaf == "running_mean":
            put(stats, path + ("mean",), val)
        elif leaf == "running_var":
            put(stats, path + ("var",), val)
        elif leaf == "bias":
            put(params, path + ("bias",), val)
        elif leaf == "weight":
            if mod_path.endswith(("tgt_embed", "denoising_class_embed")):
                put(params, path + ("embedding",), val)
            elif val.ndim == 4:
                put(params, path + ("kernel",), _t2f_conv(val))
            elif val.ndim == 2:
                put(params, path + ("kernel",), _t2f_linear(val))
            else:  # 1-D: a norm scale (BatchNorm or LayerNorm)
                put(params, path + ("scale",), val)
        else:
            raise ValueError(f"unhandled torch leaf {key!r}")

    for (section, mod), group in mha_groups.items():
        rules = {"backbone": backbone_rules,
                 "encoder": _R2_ENCODER_RULES,
                 "decoder": _R2_DECODER_RULES}[section]
        flax_mod = rewrite(rules, mod + ".").rstrip(".")
        base = (section, *flax_mod.split("."), "self_attn")
        _put_torch_mha(params, base, group, nhead, put)
    return params, stats


def _put_torch_mha(params, base, group, nhead, put):
    """Unpack one nn.MultiheadAttention (packed in_proj (3h, h) + out_proj)
    into our per-head DenseGeneral leaves at tree path ``base``. torch
    concatenates heads head-major, so plain reshapes are exact."""
    w = group["in_proj_weight"]
    b = group["in_proj_bias"]
    h = w.shape[1]
    dh = h // nhead
    for i, name in enumerate(("mha_query", "mha_key", "mha_value")):
        put(params, base + (name, "kernel"),
            _t2f_linear(w[i * h:(i + 1) * h]).reshape(h, nhead, dh))
        put(params, base + (name, "bias"),
            b[i * h:(i + 1) * h].reshape(nhead, dh))
    put(params, base + ("mha_out", "kernel"),
        _t2f_linear(group["out_proj.weight"]).reshape(nhead, dh, h))
    put(params, base + ("mha_out", "bias"), group["out_proj.bias"])


def convert_rtdetr_to_torch(params: dict, batch_stats: dict,
                            nhead: int = 8) -> dict:
    """Inverse of :func:`convert_r2_rtdetr`: our flax RTDETR trees -> an
    R2-naming torch state_dict (numpy values), so a model trained here can
    be loaded back into the reference composite
    (R2/src/zoo/rtdetr/rtdetr.py:21-51) with ``strict=False`` (the
    reference's unused ``temper_param`` / ``encoder_fusion_input`` and the
    ``num_batches_tracked`` counters are not emitted). Exact round-trip
    with the forward converter is tested in tests/test_rtdetr_torch_parity.
    """
    import re

    def flat(tree, prefix=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(flat(v, prefix + (k,)))
            else:
                out[prefix + (k,)] = np.asarray(v)
        return out

    _GHOST_INVERSE = (
        (r"^blocks_9_0_conv\.", "blocks.9.0.conv."),
        (r"^blocks_9_0_bn1\.", "blocks.9.0.bn1."),
        (r"^blocks_(\d+)_(\d+)\.", r"blocks.\1.\2."),
        (r"\.(ghost\d)\.primary_conv\.", r".\1.primary_conv.0."),
        (r"\.(ghost\d)\.primary_bn\.", r".\1.primary_conv.1."),
        (r"\.(ghost\d)\.cheap_conv\.", r".\1.cheap_operation.0."),
        (r"\.(ghost\d)\.cheap_bn\.", r".\1.cheap_operation.1."),
        (r"\.ghost1\.short_conv\.", ".ghost1.short_conv.0."),
        (r"\.ghost1\.short_bn\.", ".ghost1.short_conv.1."),
        (r"\.ghost1\.dfc_h\.", ".ghost1.short_conv.2."),
        (r"\.ghost1\.dfc_h_bn\.", ".ghost1.short_conv.3."),
        (r"\.ghost1\.dfc_v\.", ".ghost1.short_conv.4."),
        (r"\.ghost1\.dfc_v_bn\.", ".ghost1.short_conv.5."),
        (r"\.dw_conv\.", ".conv_dw."),
        (r"\.dw_bn\.", ".bn_dw."),
        (r"\.se_reduce\.", ".se.conv_reduce."),
        (r"\.se_expand\.", ".se.conv_expand."),
        (r"\.short_dw\.", ".shortcut.0."),
        (r"\.short_dw_bn\.", ".shortcut.1."),
        (r"\.short_pw\.", ".shortcut.2."),
        (r"\.short_pw_bn\.", ".shortcut.3."),
    )

    def torch_module_path(section, segs):
        dotted = ".".join(segs)
        if section == "backbone" and (segs[0].startswith("blocks_")
                                      or segs[0] == "conv_stem"):
            # GhostNetV2: invert _R2_GHOSTNET_RULES
            dotted = dotted + "."
            for pat, rep in _GHOST_INVERSE:
                dotted = re.sub(pat, rep, dotted)
            return section + "." + dotted.rstrip(".")
        if section == "backbone" and segs[0].startswith("bneck_"):
            # custom MobileNetV3: invert _R2_MOBILENET_RULES
            dotted = re.sub(r"^bneck_(\d+)\.", r"bneck.\1.", dotted + ".")
            dotted = re.sub(r"\.se\.se_(\d)\.", r".se.se.\1.", dotted)
            dotted = re.sub(r"\.skip_(\d)\.", r".skip.\1.", dotted)
            return section + "." + dotted.rstrip(".")
        if section == "backbone":
            dotted = re.sub(
                r"^res(\d+)_(\d+)\.",
                lambda m: (f"res_layers.{int(m.group(1)) - 2}"
                           f".blocks.{m.group(2)}."),
                dotted + ".")
            # vd variant: only the stride-1 res2 stage uses the plain
            # ConvNormLayer shortcut; later stages pool first (short.conv)
            if ".short_conv." in dotted:
                plain = dotted.startswith("res_layers.0.")
                dotted = dotted.replace(
                    ".short_conv.", ".short." if plain else ".short.conv.")
            dotted = re.sub(r"^(conv1_\d)\.", r"conv1.\1.", dotted)
        elif section == "encoder":
            dotted = re.sub(r"^input_proj_(\d+)_conv\.", r"input_proj.\1.0.",
                            dotted + ".")
            dotted = re.sub(r"^input_proj_(\d+)_norm\.", r"input_proj.\1.1.",
                            dotted)
            dotted = re.sub(r"^encoder_(\d+)_layer_(\d+)\.",
                            r"encoder.\1.layers.\2.", dotted)
            dotted = re.sub(
                r"^(lateral_convs|fpn_blocks|pan_blocks|downsample_convs)"
                r"_(\d+)\.", r"\1.\2.", dotted)
            dotted = re.sub(r"\.bottlenecks_(\d+)\.", r".bottlenecks.\1.",
                            dotted)
        else:  # decoder
            dotted = re.sub(r"^input_proj_(\d+)_(conv|norm)\.",
                            r"input_proj.\1.\2.", dotted + ".")
            dotted = re.sub(r"^decoder_layer_(\d+)\.", r"decoder.layers.\1.",
                            dotted)
            dotted = re.sub(r"^sigma_embed_(\d+)\.", r"decoder.sigma_embed.\1.",
                            dotted)
            dotted = re.sub(r"^(dec_bbox_head|dec_score_head)_(\d+)\.",
                            r"\1.\2.", dotted)
            dotted = re.sub(r"^enc_output_(\d+)\.", r"enc_output.\1.", dotted)
            dotted = re.sub(r"\.layers_(\d+)\.", r".layers.\1.", dotted)
        return section + "." + dotted.rstrip(".")

    sd: dict = {}
    mha: dict = {}
    for (section, *segs, leaf), val in flat(params).items():
        if len(segs) >= 2 and segs[-2] == "self_attn":
            mod = torch_module_path(section, segs[:-2]) + ".self_attn"
            mha.setdefault(mod, {})[(segs[-1], leaf)] = val
            continue
        mod = torch_module_path(section, segs)
        if leaf == "kernel":
            sd[mod + ".weight"] = (_f2t_conv(val) if val.ndim == 4
                                   else np.transpose(val))
        elif leaf == "scale":
            sd[mod + ".weight"] = val
        elif leaf == "embedding":
            sd[mod + ".weight"] = val
        else:
            sd[mod + f".{leaf}"] = val
    for (section, *segs, leaf), val in flat(batch_stats).items():
        mod = torch_module_path(section, segs)
        sd[mod + (".running_mean" if leaf == "mean" else ".running_var")] = val

    for mod, group in mha.items():
        h = group[("mha_out", "kernel")].shape[-1]
        qkv_w = [np.transpose(group[(n, "kernel")].reshape(h, h))
                 for n in ("mha_query", "mha_key", "mha_value")]
        qkv_b = [group[(n, "bias")].reshape(h)
                 for n in ("mha_query", "mha_key", "mha_value")]
        sd[mod + ".in_proj_weight"] = np.concatenate(qkv_w, 0)
        sd[mod + ".in_proj_bias"] = np.concatenate(qkv_b, 0)
        sd[mod + ".out_proj.weight"] = np.transpose(
            group[("mha_out", "kernel")].reshape(h, h))
        sd[mod + ".out_proj.bias"] = group[("mha_out", "bias")]
    return sd


def convert_r1_detr(state_dict: Dict[str, np.ndarray], nhead: int = 8):
    """R1 DETR keypoint model state_dict -> (params, batch_stats) trees for
    models.detr.DETRKeypointModel.

    Reference naming (R1/models/detr_speed.py:32-57): ``backbone.0.body.*``
    is a torchvision resnet trunk (handled by convert_torchvision_resnet),
    ``backbone.0.{s8_latern,s16_latern,output_conv}`` the Backbone8s fusion
    convs (R1/models/backbone.py:105-142), ``backbone.1`` the (parameter-
    free) sine position embedding, plus input_proj (1x1 conv), query_embed,
    cls_embed, point_embed MLP, and ``transformer.{encoder,decoder}.
    layers.N`` torch nn.Transformer-style layers (decoder cross attention
    named ``multihead_attn``). Forward parity against the live R1
    transformer/heads is tested in tests/test_detr_torch_parity.py.
    """
    import re

    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value)

    backbone_sd: dict = {}
    mha_groups: dict = {}
    for key, val in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        val = np.asarray(val)
        if key.startswith("backbone.0.body."):
            backbone_sd[key[len("backbone.0.body."):]] = val
        elif key.startswith("backbone.0."):
            mod, leaf = key[len("backbone.0."):].rsplit(".", 1)
            if leaf == "weight":
                put(params, ("backbone", mod, "kernel"), _t2f_conv(val))
            else:
                put(params, ("backbone", mod, "bias"), val)
        elif key.startswith("backbone.1."):
            continue  # sine position embedding: no parameters
        elif key == "query_embed.weight":
            params["query_embed"] = val
        elif key.startswith("input_proj."):
            leaf = key.rsplit(".", 1)[1]
            put(params, ("input_proj",
                         "kernel" if leaf == "weight" else "bias"),
                _t2f_conv(val) if leaf == "weight" else val)
        elif key.startswith(("cls_embed.", "class_embed.")):
            leaf = key.rsplit(".", 1)[1]
            put(params, ("cls_embed",
                         "kernel" if leaf == "weight" else "bias"),
                _t2f_linear(val) if leaf == "weight" else val)
        elif key.startswith("point_embed.layers."):
            _, _, idx, leaf = key.split(".")
            put(params, ("point_embed", f"layers_{idx}",
                         "kernel" if leaf == "weight" else "bias"),
                _t2f_linear(val) if leaf == "weight" else val)
        elif key.startswith("transformer."):
            rest = key[len("transformer."):]
            m = re.match(r"(encoder|decoder)\.layers\.(\d+)\.(.+)", rest)
            if m:
                base = f"{m.group(1)}_layer_{m.group(2)}"
                sub = m.group(3)
                attn = re.match(r"(self_attn|multihead_attn)\.(.+)", sub)
                if attn:
                    flax_attn = ("cross_attn" if attn.group(1) ==
                                 "multihead_attn" else "self_attn")
                    mha_groups.setdefault(
                        ("transformer", base, flax_attn), {}
                    )[attn.group(2)] = val
                    continue
                mod, leaf = sub.rsplit(".", 1)
                if mod.startswith("linear"):
                    put(params, ("transformer", base, mod,
                                 "kernel" if leaf == "weight" else "bias"),
                        _t2f_linear(val) if leaf == "weight" else val)
                else:  # norm1/2/3 LayerNorm
                    put(params, ("transformer", base, mod,
                                 "scale" if leaf == "weight" else "bias"),
                        val)
            else:  # encoder.norm / decoder.norm (final LayerNorms)
                mod, leaf = rest.rsplit(".", 1)
                flax_mod = mod.replace(".", "_")
                put(params, ("transformer", flax_mod,
                             "scale" if leaf == "weight" else "bias"), val)
        else:
            raise ValueError(f"unhandled R1 DETR key {key!r}")

    bb_params, bb_stats = convert_torchvision_resnet(backbone_sd)
    if "output_conv" in params.get("backbone", {}):
        # Backbone8s keeps its trunk under the reference's ``body`` scope
        params["backbone"]["body"] = bb_params
        stats["backbone"] = {"body": bb_stats}
    else:
        bb_params.update(params.get("backbone", {}))
        params["backbone"] = bb_params
        stats["backbone"] = bb_stats
    for base, group in mha_groups.items():
        _put_torch_mha(params, base, group, nhead, put)
    return params, stats


def surgery_detr_pretrained(state_dict: Dict[str, np.ndarray],
                            dst_params: dict, dst_stats: dict,
                            nhead: int = 8):
    """Ingest the PUBLIC DETR-R50 checkpoint (detr-r50-e632da11.pth
    ``model`` dict) with the reference's surgery semantics
    (R1/main.py:20-87 map_static_dicts): ONLY the backbone / transformer /
    input_proj / query_embed sections are taken — the COCO heads
    (class_embed, bbox_embed) are dropped, input_proj in-channels and
    query_embed rows slice-adapt to the destination shapes, and trunk
    stages the destination model does not tap (layer4 under Backbone8s)
    fall away via the partial merge. Returns (params, batch_stats) merged
    into copies of ``dst_params`` / ``dst_stats``.
    """
    keep = {
        k: v for k, v in state_dict.items()
        if k.startswith(("backbone.", "transformer.", "input_proj.",
                         "query_embed."))
    }
    src_params, src_stats = convert_r1_detr(keep, nhead=nhead)
    # The public file is a plain DETR: no Backbone8s fusion convs, so
    # convert_r1_detr leaves the trunk flat at ``backbone/``. When the
    # destination is an s8 model (trunk nested under ``backbone/body``,
    # R1/models/backbone.py:105-142), re-scope so the partial merge lands.
    if ("body" in dst_params.get("backbone", {})
            and "body" not in src_params.get("backbone", {})):
        src_params["backbone"] = {"body": src_params["backbone"]}
        src_stats["backbone"] = {"body": src_stats["backbone"]}
    return (map_static_dicts(src_params, dst_params),
            map_static_dicts(src_stats, dst_stats))


def convert_presnet_pretrained(state_dict: Dict[str, np.ndarray],
                               nhead: int = 8):
    """Ingest a paddle-converted PResNet-vd pretrained file
    (ResNet{18,34,50,101}_vd_*_pretrained_from_paddle.pth). The reference
    loads these straight into the PResNet submodule
    (R2/nn/backbone/presnet.py:26-31 donwload_url +
    ``self.load_state_dict(state)``), so the on-disk key surface is the
    module's own state_dict — i.e. convert_r2_rtdetr's backbone section
    WITHOUT the ``backbone.`` prefix. Returns (params, batch_stats)
    subtrees for models.presnet.PResNet (merge into a full model's
    ``params['backbone']`` / ``batch_stats['backbone']``).
    """
    prefixed = {f"backbone.{k}": v for k, v in state_dict.items()}
    params, stats = convert_r2_rtdetr(prefixed, nhead=nhead)
    return params.get("backbone", {}), stats.get("backbone", {})


def load_torch_checkpoint(path: str) -> dict:
    """Load a .pth file to numpy dict (CPU torch)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("model", obj) if isinstance(obj, dict) else obj
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}
