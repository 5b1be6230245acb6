"""2-D position embeddings: sine (default) and learned.

Sine math from /root/reference/models/position_encoding.py:13-49: cumulative sums
of the valid-pixel mask per axis, normalized to [0, 2*pi] by the last valid
coordinate, 128 features per axis interleaved sin/cos. Learned variant from
:52-86: 50x50 row/col embedding tables, channels = [col(x); row(y)].
Both return NHWC [B, H, W, D].
"""
from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp


def sine_position_embedding(pad_mask: jnp.ndarray, num_pos_feats: int = 128,
                            temperature: float = 10000.0, normalize: bool = True,
                            scale: float = 2 * math.pi,
                            dtype: Any = jnp.float32) -> jnp.ndarray:
    """pad_mask: [B, H, W] bool, True on PADDING. Output [B, H, W, 2*num_pos_feats]."""
    not_mask = (~pad_mask).astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)

    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                      axis=-1).reshape(*pos_x.shape[:-1], -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                      axis=-1).reshape(*pos_y.shape[:-1], -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1).astype(dtype)


class LearnedPositionEmbedding2D(nn.Module):
    """PositionEmbeddingLearned (reference position_encoding.py:52-86): 50x50
    uniform-initialized row/col tables; pos[h, w] = [col_embed[w]; row_embed[h]]
    (x features first, unlike the sine variant's [y; x]). Feature grids at
    stride 32 of <=1344px canvases stay within the 50-entry tables."""
    num_pos_feats: int = 128
    table_size: int = 50
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch: int, h: int, w: int) -> jnp.ndarray:
        init = nn.initializers.uniform(scale=1.0)  # torch nn.init.uniform_
        row = self.param("row_embed", init, (self.table_size,
                                             self.num_pos_feats))
        col = self.param("col_embed", init, (self.table_size,
                                             self.num_pos_feats))
        x_emb = col[:w][None, :, :]                          # [1, w, F]
        y_emb = row[:h][:, None, :]                          # [h, 1, F]
        pos = jnp.concatenate([
            jnp.broadcast_to(x_emb, (h, w, self.num_pos_feats)),
            jnp.broadcast_to(y_emb, (h, w, self.num_pos_feats)),
        ], axis=-1)
        return jnp.broadcast_to(pos[None], (batch, h, w,
                                            2 * self.num_pos_feats)
                                ).astype(self.dtype)
