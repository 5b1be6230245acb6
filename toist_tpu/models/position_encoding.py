"""2-D sine position embedding over the non-padded region.

Math from /root/reference/models/position_encoding.py:13-49: cumulative sums of the
valid-pixel mask per axis, normalized to [0, 2*pi] by the last valid coordinate,
128 features per axis interleaved sin/cos. Returns NHWC [B, H, W, D].
"""
from __future__ import annotations

import math
from typing import Any

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
