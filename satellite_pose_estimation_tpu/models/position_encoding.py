"""2D positional encodings for the DETR path.

* PositionEmbeddingSine — normalized-cumsum sine embedding
  (R1/models/position_encoding.py:12-53). With no padding mask (TPU batches
  are fixed-size crops, so every pixel is valid) the cumsum reduces to a
  linear ramp, computed here in closed form.
* PositionEmbeddingLearned — 50x50 learned row/col embedding
  (R1/models/position_encoding.py:56-81).
"""
from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class PositionEmbeddingSine(nn.Module):
    num_pos_feats: int = 128
    temperature: float = 10000.0
    normalize: bool = True
    scale: float = 2 * math.pi
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h: int, w: int):
        """Returns (h, w, 2*num_pos_feats) position features."""
        y_embed = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None].repeat(w, 1)
        x_embed = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :].repeat(h, 0)
        if self.normalize:
            eps = 1e-6
            y_embed = y_embed / (h + eps) * self.scale
            x_embed = x_embed / (w + eps) * self.scale

        dim_t = jnp.arange(self.num_pos_feats, dtype=jnp.float32)
        dim_t = self.temperature ** (2 * (dim_t // 2) / self.num_pos_feats)

        pos_x = x_embed[:, :, None] / dim_t
        pos_y = y_embed[:, :, None] / dim_t
        # Interleave sin on even dims, cos on odd dims.
        pos_x = jnp.stack(
            [jnp.sin(pos_x[:, :, 0::2]), jnp.cos(pos_x[:, :, 1::2])], axis=3
        ).reshape(h, w, -1)
        pos_y = jnp.stack(
            [jnp.sin(pos_y[:, :, 0::2]), jnp.cos(pos_y[:, :, 1::2])], axis=3
        ).reshape(h, w, -1)
        return jnp.concatenate([pos_y, pos_x], axis=-1).astype(self.dtype)


class PositionEmbeddingLearned(nn.Module):
    num_pos_feats: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h: int, w: int):
        row = self.param(
            "row_embed", nn.initializers.uniform(1.0), (50, self.num_pos_feats // 2)
        )
        col = self.param(
            "col_embed", nn.initializers.uniform(1.0), (50, self.num_pos_feats // 2)
        )
        x_emb = col[:w]  # (w, C/2)
        y_emb = row[:h]  # (h, C/2)
        pos = jnp.concatenate(
            [
                x_emb[None, :, :].repeat(h, 0),
                y_emb[:, None, :].repeat(w, 1),
            ],
            axis=-1,
        )
        return pos.astype(self.dtype)


def build_2d_sincos_position_embedding(w, h, embed_dim=256, temperature=10000.0):
    """RT-DETR AIFI flavour (R2/src/zoo/rtdetr/hybrid_encoder.py:319-337):
    [sin(wx), cos(wx), sin(wy), cos(wy)] blocks over a flattened grid.
    Returns (h*w, embed_dim)."""
    grid_w = jnp.arange(w, dtype=jnp.float32)
    grid_h = jnp.arange(h, dtype=jnp.float32)
    grid_w, grid_h = jnp.meshgrid(grid_w, grid_h, indexing="ij")
    pos_dim = embed_dim // 4
    omega = jnp.arange(pos_dim, dtype=jnp.float32) / pos_dim
    omega = 1.0 / (temperature ** omega)
    out_w = grid_w.reshape(-1)[:, None] * omega[None, :]
    out_h = grid_h.reshape(-1)[:, None] * omega[None, :]
    return jnp.concatenate(
        [jnp.sin(out_w), jnp.cos(out_w), jnp.sin(out_h), jnp.cos(out_h)], axis=1
    )
