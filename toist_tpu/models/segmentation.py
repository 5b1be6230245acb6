"""Segmentation head: per-query attention maps + FPN conv mask head.

Behavioral spec: /root/reference/models/segmentation.py —
  * MHAttentionMap (:244-273): multi-head attention *weights* (no value product)
    between decoder outputs and the post-encoder image memory, softmax over pixels
  * MaskHeadSmallConv (:170-241): conv/GroupNorm stack fusing C4/C3/C2 FPN features
    with nearest upsampling, emitting one stride-4 logit map per query
  * DETRsegm (:17-168): head runs on the LAST decoder layer only; detector can be
    frozen (--frozen_weights) so only the head trains

TPU-first divergence: the head can run on a SELECTED subset of queries (the
Hungarian-matched ones) during training — identical math per query, ~4x less
compute than the reference's all-100-queries pass; eval still runs all queries.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from toist_tpu.models.layers import NEG_INF


class MHAttentionMap(nn.Module):
    """q [B,N,D], k [B,H,W,D] -> softmax attention maps [B,N,heads,H,W]."""
    hidden_dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, pad_mask: Optional[jnp.ndarray] = None):
        D, nh = self.hidden_dim, self.num_heads
        hd = D // nh
        q = nn.Dense(D, dtype=self.dtype, name="q_linear")(q)
        k = nn.Dense(D, dtype=self.dtype, name="k_linear")(k)
        B, N, _ = q.shape
        H, W = k.shape[1], k.shape[2]
        qh = q.reshape(B, N, nh, hd) * (hd ** -0.5)
        kh = k.reshape(B, H, W, nh, hd)
        w = jnp.einsum("bnhc,byxhc->bnhyx", qh.astype(jnp.float32),
                       kh.astype(jnp.float32))
        if pad_mask is not None:
            w = jnp.where(pad_mask[:, None, None, :, :], NEG_INF, w)
        w = jax.nn.softmax(w.reshape(B, N, nh, H * W), axis=-1)
        return w.reshape(B, N, nh, H, W).astype(self.dtype)


class MaskHeadSmallConv(nn.Module):
    """FPN-style conv head (reference :170-241), NHWC.

    Input: per-query feature stack [B*N, h32, w32, dim + nheads]; FPN features
    C4/C3/C2 (strides 16/8/4). Output [B*N, h4, w4, 1] logits.
    """
    dim: int            # hidden_dim + nheads
    context_dim: int    # hidden_dim
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, fpn_c4, fpn_c3, fpn_c2, num_queries: int):
        cd = self.context_dim
        inter = [self.dim, cd // 2, cd // 4, cd // 8, cd // 16, cd // 64]

        def conv_gn(x, cout, name):
            x = nn.Conv(cout, (3, 3), padding=1, dtype=self.dtype,
                        name=f"lay{name}")(x)
            x = nn.GroupNorm(num_groups=8, dtype=self.dtype,
                             name=f"gn{name}")(x)
            return nn.relu(x)

        def upsample_to(x, h, w):
            # nearest-neighbor, factor-2 FPN steps
            B_, hh, ww, c = x.shape
            x = jnp.repeat(jnp.repeat(x, h // hh, axis=1), w // ww, axis=2)
            return x

        def expand(f):
            # [B, h, w, c] -> [B*N, h, w, c] matching the flattened queries
            return jnp.repeat(f, num_queries, axis=0)

        x = conv_gn(x, self.dim, "1")
        x = conv_gn(x, inter[1], "2")

        a1 = expand(nn.Conv(inter[1], (1, 1), dtype=self.dtype,
                            name="adapter1")(fpn_c4))
        x = a1 + upsample_to(x, a1.shape[1], a1.shape[2])
        x = conv_gn(x, inter[2], "3")

        a2 = expand(nn.Conv(inter[2], (1, 1), dtype=self.dtype,
                            name="adapter2")(fpn_c3))
        x = a2 + upsample_to(x, a2.shape[1], a2.shape[2])
        x = conv_gn(x, inter[3], "4")

        a3 = expand(nn.Conv(inter[3], (1, 1), dtype=self.dtype,
                            name="adapter3")(fpn_c2))
        x = a3 + upsample_to(x, a3.shape[1], a3.shape[2])
        x = conv_gn(x, inter[4], "5")

        return nn.Conv(1, (3, 3), padding=1, dtype=jnp.float32,
                       name="out_lay")(x)
