"""DETR keypoint-set model — the R1 flagship architecture.

Reference: DETR in R1/models/detr_speed.py:32-100. Backbone feature map ->
1x1 input projection to hidden_dim -> transformer with learned query
embeddings -> two heads per decoder layer:
  cls_embed:  Linear(hidden, num_keypoints + 1)  (11 keypoints + background)
  point_embed: MLP(hidden, hidden, 2, 3) with sigmoid -> normalized (x, y)

Outputs a dict with 'pred_logits' (B, Q, 12), 'pred_points' (B, Q, 2) plus
'aux_outputs' for every intermediate decoder layer.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .layers import MLP
from .position_encoding import PositionEmbeddingSine, PositionEmbeddingLearned
from .resnet import Backbone8s, ResNet
from .transformer import Transformer
from ..ops.precision import to_loss_dtype


@dataclasses.dataclass(frozen=True)
class DETRConfig:
    """Mirrors the R1 CLI surface (R1/main.py:90-187)."""

    backbone: str = "resnet50s8"  # resnet18/34/50 or resnet50s8
    bn: str = "frozen_bn"
    dilation: bool = False
    position_embedding: str = "sine"  # sine | learned
    hidden_dim: int = 256
    nheads: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    pre_norm: bool = False
    num_queries: int = 20
    num_keypoints: int = 11
    aux_loss: bool = True
    use_flash_attention: bool = False  # Pallas flash encoder self-attn
    quantize_int8: bool = False  # int8 backbone convs + encoder FFN (eval)
    remat: bool = False  # remat encoder layers in training (measured: no win at this scale)
    dtype: Any = jnp.float32


class DETRKeypointModel(nn.Module):
    config: DETRConfig

    @nn.compact
    def __call__(self, images, train: bool = False):
        """images: (B, H, W, 3) normalized crops. Returns output dict."""
        cfg = self.config
        dtype = cfg.dtype

        if cfg.backbone == "resnet50s8":
            feats = Backbone8s(norm=cfg.bn, dtype=dtype,
                               quant=cfg.quantize_int8, name="backbone")(
                images, train)
            num_channels = 512
        else:
            feats = ResNet(
                arch=cfg.backbone, taps=(3,), norm=cfg.bn, dtype=dtype,
                quant=cfg.quantize_int8, name="backbone",
            )(images, train)
            num_channels = ResNet.tap_channels(cfg.backbone, 3)
        src = feats[-1]
        b, h, w, _ = src.shape

        src = nn.Conv(cfg.hidden_dim, (1, 1), dtype=dtype, name="input_proj")(src)

        if cfg.position_embedding == "sine":
            pos = PositionEmbeddingSine(
                num_pos_feats=cfg.hidden_dim // 2, dtype=dtype, name="pos_enc"
            )(h, w)
        else:
            pos = PositionEmbeddingLearned(
                num_pos_feats=cfg.hidden_dim, dtype=dtype, name="pos_enc"
            )(h, w)

        query_embed = self.param(
            "query_embed",
            nn.initializers.normal(1.0),
            (cfg.num_queries, cfg.hidden_dim),
        )

        hs, _ = Transformer(
            d_model=cfg.hidden_dim,
            nhead=cfg.nheads,
            num_encoder_layers=cfg.enc_layers,
            num_decoder_layers=cfg.dec_layers,
            dim_feedforward=cfg.dim_feedforward,
            dropout=cfg.dropout,
            normalize_before=cfg.pre_norm,
            dtype=dtype,
            use_flash=cfg.use_flash_attention,
            quant=cfg.quantize_int8,
            remat=cfg.remat,
            name="transformer",
        )(src, query_embed, pos, deterministic=not train)
        # hs: (L, B, Q, C)

        cls_head = nn.Dense(
            cfg.num_keypoints + 1, dtype=dtype, name="cls_embed"
        )
        point_head = MLP(cfg.hidden_dim, 2, 3, dtype=dtype, name="point_embed")

        logits = cls_head(hs)  # (L, B, Q, 12)
        points = nn.sigmoid(point_head(hs))  # (L, B, Q, 2)

        out = {
            "pred_logits": to_loss_dtype(logits[-1]),
            "pred_points": to_loss_dtype(points[-1]),
        }
        if cfg.aux_loss:
            out["aux_outputs"] = [
                {
                    "pred_logits": to_loss_dtype(logits[i]),
                    "pred_points": to_loss_dtype(points[i]),
                }
                for i in range(logits.shape[0] - 1)
            ]
        return out


def build_detr_model(config: Optional[DETRConfig] = None) -> DETRKeypointModel:
    return DETRKeypointModel(config or DETRConfig())
