"""RT-DETR composite model: PResNet -> HybridEncoder -> RTDETRTransformer.

Capability parity with R2/src/zoo/rtdetr/rtdetr.py:20-61. ``deploy`` swaps
every RepVggBlock to its fused single-conv form; use
``convert_params_to_deploy`` to fold trained branch weights into the fused
kernels (the reference's convert_to_deploy walk).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .hybrid_encoder import HybridEncoder, fuse_repvgg_params
from .presnet import PResNet
from .rtdetr_decoder import RTDETRTransformer


@dataclasses.dataclass(frozen=True)
class RTDETRConfig:
    """Mirrors the rtdetr_r50vd speed config surface
    (R2/configs/rtdetr_speed/include/rtdetr_r50vd.yml)."""

    backbone: str = "presnet"  # presnet | mobilenetv3_large | mobilenetv3_small
    depth: int = 50
    variant: str = "d"
    return_idx: Sequence[int] = (1, 2, 3)
    freeze_norm: bool = True
    num_classes: int = 11
    hidden_dim: int = 256
    num_queries: int = 30
    num_decoder_layers: int = 3
    nhead: int = 8
    dim_feedforward: int = 1024
    expansion: float = 1.0
    dropout: float = 0.0
    learnt_init_query: bool = False
    box_dim: int = 2  # 2 = speed landmarker, 4 = COCO detection
    num_denoising: int = 0  # CDN groups (train-only; models/denoising.py)
    label_noise_ratio: float = 0.5
    box_noise_scale: float = 1.0
    deploy: bool = False
    dtype: Any = jnp.float32


class RTDETR(nn.Module):
    config: RTDETRConfig

    @nn.compact
    def __call__(self, images, train: bool = False, targets=None):
        cfg = self.config
        if cfg.backbone.startswith("mobilenetv3"):
            from .mobilenetv3 import MobileNetV3

            backbone = MobileNetV3(
                mode=cfg.backbone.split("_")[-1],
                dtype=cfg.dtype,
                name="backbone",
            )
        elif cfg.backbone == "ghostnetv2":
            from .ghostnetv2 import GhostNetV2

            backbone = GhostNetV2(dtype=cfg.dtype, name="backbone")
        else:
            backbone = PResNet(
                depth=cfg.depth,
                variant=cfg.variant,
                return_idx=cfg.return_idx,
                freeze_norm=cfg.freeze_norm,
                dtype=cfg.dtype,
                name="backbone",
            )
        feats = backbone(images, train)
        feats = HybridEncoder(
            in_channels=tuple(backbone.out_channels),
            hidden_dim=cfg.hidden_dim,
            nhead=cfg.nhead,
            dim_feedforward=cfg.dim_feedforward,
            expansion=cfg.expansion,
            dropout=cfg.dropout,
            deploy=cfg.deploy,
            dtype=cfg.dtype,
            name="encoder",
        )(feats, train)
        return RTDETRTransformer(
            num_classes=cfg.num_classes,
            hidden_dim=cfg.hidden_dim,
            num_queries=cfg.num_queries,
            num_decoder_layers=cfg.num_decoder_layers,
            nhead=cfg.nhead,
            dim_feedforward=cfg.dim_feedforward,
            dropout=cfg.dropout,
            learnt_init_query=cfg.learnt_init_query,
            box_dim=cfg.box_dim,
            num_denoising=cfg.num_denoising,
            label_noise_ratio=cfg.label_noise_ratio,
            box_noise_scale=cfg.box_noise_scale,
            dtype=cfg.dtype,
            name="decoder",
        )(feats, train, targets=targets)


def convert_params_to_deploy(params, batch_stats):
    """Fold every RepVggBlock's two conv+BN branches into the fused conv the
    deploy-mode model expects. Returns new params tree for
    RTDETRConfig(deploy=True)."""
    import copy

    def walk(p, s):
        if not isinstance(p, dict):
            return p
        # A RepVggBlock node has EXACTLY the two ConvNormLayer branches;
        # CSPRepLayer also nests conv1/conv2 (+ bottlenecks_*) so keying on
        # their mere presence would wrongly fuse whole CSP layers.
        if set(p.keys()) == {"conv1", "conv2"} and "conv" in p["conv1"]:
            return fuse_repvgg_params(p, s)
        return {
            k: walk(v, s.get(k, {}) if isinstance(s, dict) else {})
            for k, v in p.items()
        }

    return walk(copy.deepcopy(dict(params)), dict(batch_stats))
