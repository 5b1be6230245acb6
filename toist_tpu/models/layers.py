"""Shared transformer building blocks (batch-first, flax.linen).

Matches torch nn.MultiheadAttention semantics (separate per-head projections with an
output projection; key_padding_mask excludes padded keys) so the torch->JAX checkpoint
converter can unpack the reference's packed in_proj weights (SURVEY.md §7 hard part 3).
Layout is batch-first [B, S, D] throughout — the reference's seq-first layout is a
torch idiosyncrasy with no TPU benefit.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

NEG_INF = -1e9  # large-negative fill for masked attention logits (finite: keeps
                # softmax well-defined for fully-masked rows of padded samples)


def _dropout_u8(module: nn.Module, x: jnp.ndarray, rate: float,
                deterministic: bool) -> jnp.ndarray:
    """Dropout drawing 8 random bits per element instead of 32.

    The attention-probs dropout masks are the largest tensors in the train
    step ([B, H, S, S] with S~1100); jax.random.bernoulli consumes a uint32
    per element (~240MB/layer of RNG traffic at flagship shapes). uint8 bits
    quantize the keep-probability to 1/256 granularity (0.1 -> 26/256 =
    0.1016, folded into the rescale so E[x] is exact), which is statistically
    immaterial for dropout but 4x cheaper to generate and move.
    """
    if deterministic or rate == 0.0:
        return x
    # Clamp to 255: q=256 would wrap the uint8 compare literal to 0 (keeping
    # everything) and make the rescale 1/(1-1) = inf.
    q = min(int(round(rate * 256.0)), 255)
    if q <= 0:
        return x
    import jax

    key = module.make_rng("dropout")
    keep = jax.random.bits(key, x.shape, dtype=jnp.uint8) >= q
    scale = jnp.asarray(1.0 / (1.0 - q / 256.0), x.dtype)
    return jnp.where(keep, x * scale, jnp.zeros((), x.dtype))


# Minimum key length for the fused kernel: shorter sequences (the decoder's
# 100-query self-attention) pad to a full 256 tile for no HBM win.
FUSED_MIN_KV = 256


class MultiheadAttention(nn.Module):
    """q/k/v Linear -> scaled dot-product -> out Linear, with key padding mask.

    fused="on"/"interpret" routes the scaled-dot-product core through the
    Pallas flash kernel (ops/flash_attention.py): no [B,H,Q,S] probability
    tensor in HBM, dropout drawn in-kernel. The unfused einsum path is the
    reference semantics oracle (torch nn.MultiheadAttention parity)."""
    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Any = jnp.float32
    fused: str = "off"   # off | on | interpret (interpret = CPU testing mode)
    mesh: Any = None     # data-parallel Mesh: fused kernel runs per-shard
                         # under shard_map (ops/flash_attention.fused_attention)

    @nn.compact
    def __call__(self, query, key, value,
                 key_padding_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        """query [B,Q,D], key/value [B,S,D], key_padding_mask [B,S] True=pad."""
        D, H = self.embed_dim, self.num_heads
        hd = D // H
        dense = lambda name: nn.Dense(D, dtype=self.dtype, name=name)
        q = dense("q_proj")(query)
        k = dense("k_proj")(key)
        v = dense("v_proj")(value)
        B, Q, _ = q.shape
        S = k.shape[1]
        if self.fused != "off" and S >= FUSED_MIN_KV:
            from toist_tpu.ops.flash_attention import fused_attention
            seed = None
            if not deterministic and self.dropout > 0.0:
                import jax
                seed = jax.random.bits(
                    self.make_rng("dropout"), (1,),
                    dtype=jnp.uint32).astype(jnp.int32)
            out = fused_attention(
                q, k, v, key_padding_mask, H, dropout_rate=self.dropout,
                deterministic=deterministic, seed=seed,
                interpret=(self.fused == "interpret"), mesh=self.mesh)
            return nn.Dense(D, dtype=self.dtype, name="out_proj")(out)
        q = q.reshape(B, Q, H, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, H, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, H, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhsd->bhqs", q, k,
                            preferred_element_type=jnp.float32) / jnp.sqrt(
                                jnp.float32(hd))
        if key_padding_mask is not None:
            logits = jnp.where(key_padding_mask[:, None, None, :], NEG_INF,
                               logits)
        attn = nn.softmax(logits, axis=-1).astype(self.dtype)
        attn = _dropout_u8(self, attn, self.dropout, deterministic)
        out = jnp.einsum("bhqs,bhsd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, Q, D)
        return nn.Dense(D, dtype=self.dtype, name="out_proj")(out)


class FFN(nn.Module):
    d_model: int
    dim_feedforward: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
        h = nn.relu(h)
        h = _dropout_u8(self, h, self.dropout, deterministic)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(h)
        return h


class MLP(nn.Module):
    """Simple multi-layer perceptron (reference models/mdetr.py MLP head)."""
    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype,
                                 name=f"layer{i}")(x))
        return nn.Dense(self.output_dim, dtype=self.dtype,
                        name=f"layer{self.num_layers - 1}")(x)


class FeatureResizer(nn.Module):
    """Linear + LayerNorm(eps 1e-12) + dropout (reference transformer.py:473-492)."""
    output_dim: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.output_dim, dtype=self.dtype, name="fc")(x)
        x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="layer_norm")(x)
        return _dropout_u8(self, x, self.dropout, deterministic)
