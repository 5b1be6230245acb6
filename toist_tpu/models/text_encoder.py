"""RoBERTa text encoder in flax.linen (batch-first).

The reference uses HF's torch RobertaModel (models/transformer.py:59-64); this is a
from-scratch flax implementation of the same architecture (learned byte-BPE embeddings,
padding-offset position embeddings, post-norm encoder blocks with GELU) sized by config
so tests can run a tiny variant and the parity path can load converted roberta-base
weights. RoBERTa position ids start at pad_id + 1 and skip padding positions.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from toist_tpu.models.layers import MultiheadAttention


class RobertaEmbeddings(nn.Module):
    vocab_size: int
    hidden_size: int
    max_position: int = 514
    pad_id: int = 1
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, deterministic: bool = True):
        mask = (input_ids != self.pad_id).astype(jnp.int32)
        position_ids = jnp.cumsum(mask, axis=1) * mask + self.pad_id
        x = nn.Embed(self.vocab_size, self.hidden_size, dtype=self.dtype,
                     name="word_embeddings")(input_ids)
        x = x + nn.Embed(self.max_position, self.hidden_size, dtype=self.dtype,
                         name="position_embeddings")(position_ids)
        x = x + nn.Embed(1, self.hidden_size, dtype=self.dtype,
                         name="token_type_embeddings")(
                             jnp.zeros_like(input_ids))
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="LayerNorm")(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class RobertaLayer(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, key_padding_mask, deterministic: bool = True):
        attn = MultiheadAttention(self.hidden_size, self.num_heads,
                                  dropout=self.dropout, dtype=self.dtype,
                                  name="attention")(
            x, x, x, key_padding_mask=key_padding_mask,
            deterministic=deterministic)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         name="attention_norm")(x + attn)
        h = nn.Dense(self.intermediate_size, dtype=self.dtype,
                     name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.hidden_size, dtype=self.dtype, name="output")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            name="output_norm")(x + h)


class RobertaEncoder(nn.Module):
    """input_ids [B, T] (+ pad mask) -> last hidden state [B, T, hidden].

    With ``add_pooler`` (the CLS contrastive path, reference
    transformer.py:159: ``encoded_text.pooler_output``) returns
    (hidden, pooled) where pooled = tanh(Dense(hidden[:, 0])) like HF's
    RobertaPooler."""
    vocab_size: int = 50265
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position: int = 514
    pad_id: int = 1
    dropout: float = 0.1
    dtype: Any = jnp.float32
    add_pooler: bool = False

    @nn.compact
    def __call__(self, input_ids, key_padding_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        if key_padding_mask is None:
            key_padding_mask = input_ids == self.pad_id
        x = RobertaEmbeddings(self.vocab_size, self.hidden_size,
                              self.max_position, self.pad_id, self.dropout,
                              self.dtype, name="embeddings")(
                                  input_ids, deterministic)
        for i in range(self.num_layers):
            x = RobertaLayer(self.hidden_size, self.num_heads,
                             self.intermediate_size, self.dropout, self.dtype,
                             name=f"layer_{i}")(x, key_padding_mask,
                                                deterministic)
        if self.add_pooler:
            pooled = jnp.tanh(nn.Dense(self.hidden_size, dtype=self.dtype,
                                       name="pooler")(x[:, 0]))
            return x, pooled
        return x
