"""Encoder attention-map visualisation (R1/visualize_features.py equivalent).

Recomputes encoder self-attention weights for a chosen DETR layer directly
from the trained projection parameters (flax's fused attention doesn't
expose weights), then renders attention heatmaps for selected anchor
locations over the crop. Headless: writes PNGs.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def encoder_attention_maps(params, tokens, pos, layer: int):
    """Attention weights of encoder layer `layer`.

    params: DETR params tree; tokens (T, C) entering the layer; pos (T, C).
    Returns (heads, T, T) softmax weights (query index t attends row t).
    """
    import jax
    import jax.numpy as jnp

    attn = params["transformer"][f"encoder_layer_{layer}"]["self_attn"]
    q_k = np.asarray(attn["mha_query"]["kernel"])  # (C, H, D)
    q_b = np.asarray(attn["mha_query"]["bias"])
    k_k = np.asarray(attn["mha_key"]["kernel"])
    k_b = np.asarray(attn["mha_key"]["bias"])

    x = np.asarray(tokens + pos, np.float32)
    D = q_k.shape[2]
    q = np.einsum("tc,chd->thd", x, q_k) + q_b
    k = np.einsum("tc,chd->thd", x, k_k) + k_b
    scores = np.einsum("thd,shd->hts", q, k) / np.sqrt(D)
    return np.asarray(jax.nn.softmax(jnp.asarray(scores), axis=-1))


def main(args):
    import cv2
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from ..core.yaml_config import YAMLConfig
    from ..data.dataset import SpeedTrainDataset
    from ..models.position_encoding import PositionEmbeddingSine
    from ..ops.image_warp import crop_resize_cubic_mxu

    cfg = YAMLConfig(args.config)
    model = cfg.build_model()
    restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(args.resume))
    params = restored.get("ema_params") or restored["params"]
    variables = {"params": params}
    if restored.get("batch_stats"):
        variables["batch_stats"] = restored["batch_stats"]

    ds = SpeedTrainDataset(
        args.data_root, index_file=args.index_file, train=False,
        resize=args.input_size,
    )
    os.makedirs(args.out_dir, exist_ok=True)

    for i in range(min(args.limit, len(ds))):
        s = ds[i]
        crop = crop_resize_cubic_mxu(
            jnp.asarray(s["image"]), jnp.asarray(s["clip_bbox_buf"]),
            args.input_size, True,
        )
        raw = np.asarray(
            crop_resize_cubic_mxu(
                jnp.asarray(s["image"]), jnp.asarray(s["clip_bbox_buf"]),
                args.input_size, False,
            )
        ).astype(np.uint8)

        # Tokens entering the transformer = input_proj output (flattened).
        _, inter = model.apply(
            variables, crop[None], train=False,
            capture_intermediates=lambda mdl, _:
                getattr(mdl, "name", "") == "input_proj",
        )
        feat = np.asarray(
            jax.tree_util.tree_leaves(inter["intermediates"])[0]
        )[0]  # (h, w, C)
        h, w, C = feat.shape
        tokens = feat.reshape(h * w, C)
        pos = np.asarray(
            PositionEmbeddingSine(num_pos_feats=C // 2).apply({}, h, w)
        ).reshape(h * w, C)

        weights = encoder_attention_maps(params, tokens, pos, args.layer)
        mean_w = weights.mean(0)  # (T, T) head-averaged

        # Heatmaps for a 3x3 grid of anchor locations (like the reference's
        # click-points), upsampled over the crop.
        vis_rows = []
        for gy in (h // 4, h // 2, 3 * h // 4):
            row = []
            for gx in (w // 4, w // 2, 3 * w // 4):
                att = mean_w[gy * w + gx].reshape(h, w)
                att = att / max(att.max(), 1e-9)
                heat = cv2.applyColorMap(
                    (att * 255).astype(np.uint8), cv2.COLORMAP_JET
                )
                heat = cv2.resize(heat, (args.input_size, args.input_size))
                blend = cv2.addWeighted(
                    cv2.cvtColor(raw, cv2.COLOR_RGB2BGR), 0.5, heat, 0.5, 0
                )
                cv2.circle(
                    blend,
                    (int(gx * args.input_size / w),
                     int(gy * args.input_size / h)),
                    4, (255, 255, 255), -1,
                )
                row.append(blend)
            vis_rows.append(np.concatenate(row, axis=1))
        grid = np.concatenate(vis_rows, axis=0)
        out_path = os.path.join(
            args.out_dir, f"attn_l{args.layer}_{s['filename']}.png"
        )
        cv2.imwrite(out_path, grid)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", "-c", required=True)
    parser.add_argument("--resume", "-r", required=True)
    parser.add_argument("--data_root", default="./data/speed")
    parser.add_argument("--index_file", default="val_1.txt")
    parser.add_argument("--input_size", type=int, default=224)
    parser.add_argument("--layer", type=int, default=0)
    parser.add_argument("--out_dir", default="vis_features")
    parser.add_argument("--limit", type=int, default=8)
    main(parser.parse_args())
