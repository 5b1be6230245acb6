"""Joint cross-modal encoder + query decoder (batch-first, flax.linen).

Behavioral spec: /root/reference/models/transformer.py —
  * encoder layers are post-norm; position embedding added to q,k only (:297-303)
  * image tokens and text tokens are CONCATENATED along the sequence and jointly
    self-attended (:144-150); text pos embedding is zero (:148)
  * decoder layer = query self-attn -> cross-attn to the full joint memory (text
    cross-attn is dead code in the reference, :383-391) -> FFN (:362-408)
  * decoder returns all intermediate layer outputs, each through the final
    LayerNorm, for aux losses (:240-265)
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from toist_tpu.models.layers import FFN, MultiheadAttention, _dropout_u8


class EncoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    dtype: Any = jnp.float32
    fused: str = "off"
    mesh: Any = None

    @nn.compact
    def __call__(self, src, pos, key_padding_mask, deterministic=True):
        q = k = src + pos
        src2 = MultiheadAttention(self.d_model, self.nhead, self.dropout,
                                  self.dtype, self.fused, self.mesh,
                                  name="self_attn")(
            q, k, src, key_padding_mask=key_padding_mask,
            deterministic=deterministic)
        src = src + _dropout_u8(self, src2, self.dropout, deterministic)
        src = nn.LayerNorm(dtype=self.dtype, name="norm1")(src)
        src2 = FFN(self.d_model, self.dim_feedforward, self.dropout,
                   self.dtype, name="ffn")(src, deterministic)
        src = src + _dropout_u8(self, src2, self.dropout, deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(src)


class DecoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    dtype: Any = jnp.float32
    fused: str = "off"
    mesh: Any = None

    @nn.compact
    def __call__(self, tgt, memory, query_pos, pos, memory_key_padding_mask,
                 deterministic=True):
        q = k = tgt + query_pos
        tgt2 = MultiheadAttention(self.d_model, self.nhead, self.dropout,
                                  self.dtype, name="self_attn")(
            q, k, tgt, deterministic=deterministic)
        tgt = tgt + _dropout_u8(self, tgt2, self.dropout, deterministic)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm1")(tgt)
        tgt2 = MultiheadAttention(self.d_model, self.nhead, self.dropout,
                                  self.dtype, self.fused, self.mesh,
                                  name="cross_attn_image")(
            tgt + query_pos, memory + pos, memory,
            key_padding_mask=memory_key_padding_mask,
            deterministic=deterministic)
        tgt = tgt + _dropout_u8(self, tgt2, self.dropout, deterministic)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm3")(tgt)
        tgt2 = FFN(self.d_model, self.dim_feedforward, self.dropout,
                   self.dtype, name="ffn")(tgt, deterministic)
        tgt = tgt + _dropout_u8(self, tgt2, self.dropout, deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="norm4")(tgt)


class JointEncoder(nn.Module):
    d_model: int
    nhead: int
    num_layers: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    dtype: Any = jnp.float32
    remat: bool = False
    fused: str = "off"
    mesh: Any = None

    @nn.compact
    def __call__(self, src, pos, key_padding_mask, deterministic=True):
        layer_cls = nn.remat(EncoderLayer, static_argnums=(4,)) \
            if self.remat else EncoderLayer
        for i in range(self.num_layers):
            src = layer_cls(self.d_model, self.nhead, self.dim_feedforward,
                            self.dropout, self.dtype, self.fused, self.mesh,
                            name=f"layer_{i}")(src, pos, key_padding_mask,
                                               deterministic)
        return src


class QueryDecoder(nn.Module):
    """Returns stacked per-layer outputs [num_layers, B, Q, D], each through the
    shared final LayerNorm (reference TransformerDecoder :240-265)."""
    d_model: int
    nhead: int
    num_layers: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    dtype: Any = jnp.float32
    fused: str = "off"
    mesh: Any = None

    @nn.compact
    def __call__(self, tgt, memory, query_pos, pos, memory_key_padding_mask,
                 deterministic=True):
        norm = nn.LayerNorm(dtype=self.dtype, name="norm")
        intermediate = []
        for i in range(self.num_layers):
            tgt = DecoderLayer(self.d_model, self.nhead, self.dim_feedforward,
                               self.dropout, self.dtype, self.fused,
                               self.mesh, name=f"layer_{i}")(
                tgt, memory, query_pos, pos, memory_key_padding_mask,
                deterministic)
            intermediate.append(norm(tgt))
        return jnp.stack(intermediate, axis=0)
