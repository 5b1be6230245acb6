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


class _FoldedConv(nn.Module):
    """Conv with weights SHARED across n query blocks folded into the channel
    dim: x [B, h, w, n*cin] -> [B, h, w, n*cout]; math identical to applying
    one [k,k,cin,cout] conv per query in the flat [B*n, h, w, cin] layout.

    Parameters are exactly nn.Conv's ({kernel [k,k,cin,cout], bias [cout]}),
    so the flat and folded heads share state dicts. Two lowerings:
      * "grouped": lax.conv feature_group_count=n with the kernel tiled n
        times along the output-channel axis (group i then reads block i with
        the original weights).
      * "shifts": the 3x3 conv as 9 shifted [*, cin] @ [cin, cout] matmuls
        (einsum over the folded [B,h,w,n,cin] view) — plain dots, no conv op,
        for backends where grouped convs lower poorly.
    """
    cin: int
    cout: int
    n: int
    ksize: int = 3
    impl: str = "grouped"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.ksize, self.ksize, self.cin, self.cout), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.cout,),
                          jnp.float32)
        x = x.astype(self.dtype)
        k = kernel.astype(self.dtype)
        if self.impl == "grouped":
            y = jax.lax.conv_general_dilated(
                x, jnp.tile(k, (1, 1, 1, self.n)), (1, 1),
                [(self.ksize // 2,) * 2] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.n)
        else:
            B, h, w, _ = x.shape
            pad = self.ksize // 2
            xp = jnp.pad(x.reshape(B, h, w, self.n, self.cin),
                         ((0, 0), (pad, pad), (pad, pad), (0, 0), (0, 0)))
            y = None
            for dy in range(self.ksize):
                for dx in range(self.ksize):
                    t = jnp.einsum("bhwnc,cd->bhwnd",
                                   xp[:, dy:dy + h, dx:dx + w], k[dy, dx])
                    y = t if y is None else y + t
            y = y.reshape(B, h, w, self.n * self.cout)
        return y + jnp.tile(bias.astype(self.dtype), self.n)


class _FoldedGroupNorm(nn.Module):
    """GroupNorm over per-query channel blocks of a folded [B,h,w,n*c] tensor;
    matches flax nn.GroupNorm(num_groups) applied per query in the flat
    layout (same epsilon, fast-variance E[x^2]-E[x]^2, float32 reductions).
    Parameters are nn.GroupNorm's ({scale [c], bias [c]})."""
    c: int
    n: int
    num_groups: int = 8
    epsilon: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.c,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.c,),
                          jnp.float32)
        B, h, w, _ = x.shape
        g, cg = self.num_groups, self.c // self.num_groups
        xg = x.reshape(B, h, w, self.n, g, cg).astype(jnp.float32)
        mean = xg.mean(axis=(1, 2, 5), keepdims=True)
        var = (xg * xg).mean(axis=(1, 2, 5), keepdims=True) - mean * mean
        xn = (xg - mean) * jax.lax.rsqrt(var + self.epsilon)
        xn = (xn * scale.reshape(g, cg) + bias.reshape(g, cg))
        return xn.reshape(B, h, w, self.n * self.c).astype(self.dtype)


class _FoldedSplitConv(nn.Module):
    """lay1 of the folded head: one conv whose input channels split into a
    per-IMAGE part (src, cin_src channels, identical across queries) and a
    per-QUERY part (att, folded [B,h,w,n*cin_att]).

    Parameters are exactly the flat head's nn.Conv lay1
    ({kernel [k,k,cin_src+cin_att,cout], bias [cout]}, input order
    [src..., att...] matching toist.decode_masks' concat), so checkpoints are
    interchangeable. The src half is convolved ONCE per image with
    kernel[:, :, :cin_src] and channel-tiled across the n query blocks — the
    flat layout recomputes it n times; the att half runs as a folded
    group-conv with kernel[:, :, cin_src:].
    """
    cin_src: int
    cin_att: int
    cout: int
    n: int
    ksize: int = 3
    impl: str = "grouped"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, att_f):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.ksize, self.ksize, self.cin_src + self.cin_att, self.cout),
            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.cout,),
                          jnp.float32)
        k = kernel.astype(self.dtype)
        pad = [(self.ksize // 2,) * 2] * 2
        dn = ("NHWC", "HWIO", "NHWC")
        y_src = jax.lax.conv_general_dilated(
            src.astype(self.dtype), k[:, :, :self.cin_src], (1, 1), pad,
            dimension_numbers=dn)
        k_att = k[:, :, self.cin_src:]
        att_f = att_f.astype(self.dtype)
        if self.impl == "grouped":
            y_att = jax.lax.conv_general_dilated(
                att_f, jnp.tile(k_att, (1, 1, 1, self.n)), (1, 1), pad,
                dimension_numbers=dn, feature_group_count=self.n)
        else:
            B, h, w, _ = att_f.shape
            p = self.ksize // 2
            xp = jnp.pad(att_f.reshape(B, h, w, self.n, self.cin_att),
                         ((0, 0), (p, p), (p, p), (0, 0), (0, 0)))
            y_att = None
            for dy in range(self.ksize):
                for dx in range(self.ksize):
                    t = jnp.einsum("bhwnc,cd->bhwnd",
                                   xp[:, dy:dy + h, dx:dx + w],
                                   k_att[dy, dx])
                    y_att = t if y_att is None else y_att + t
            y_att = y_att.reshape(B, h, w, self.n * self.cout)
        return (jnp.tile(y_src + bias.astype(self.dtype), (1, 1, 1, self.n))
                + y_att)


class MaskHeadSmallConvFolded(nn.Module):
    """MaskHeadSmallConv with the query axis folded into the channel dim.

    TPU-first restructuring of the reference head (segmentation.py:170-241):
    the flat layout runs [B*N, h, w, 16..64]-channel tensors whose 16/32-wide
    channel dims land on 128-wide lanes 2-8x underutilized and force layout
    copies between convs (measured 10.6 ms of a 51.4 ms seg-train step).
    Folding N queries into channels gives [B, h, w, N*c] tensors (N=25
    matched queries x 16 >= 400 channels) with identical math:
      * convs share weights across query blocks (_FoldedConv);
      * GroupNorm normalizes per query block (_FoldedGroupNorm);
      * the per-image FPN adapters and the shared-feature half of lay1 are
        computed ONCE per image and tiled across queries — the flat layout
        recomputes the lay1 features-part N times (256 of its 264 input
        channels are query-independent), ~14x more lay1 FLOPs.

    Submodule names/param shapes are identical to MaskHeadSmallConv, so the
    two heads load the same checkpoints; equivalence is tested.
    Inputs: src [B, h32, w32, D] (shared projected features), att
    [B, N, nheads, h32, w32] attention maps. Output [B*N, h4, w4, 1] logits
    (flat, matching MaskHeadSmallConv's contract).
    """
    dim: int            # hidden_dim + nheads
    context_dim: int    # hidden_dim
    conv_impl: str = "grouped"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, att, fpn_c4, fpn_c3, fpn_c2):
        cd = self.context_dim
        inter = [self.dim, cd // 2, cd // 4, cd // 8, cd // 16, cd // 64]
        B, N, nh = att.shape[0], att.shape[1], att.shape[2]
        D = self.dim - nh

        def conv_gn(x, cin, cout, name, ksize=3):
            x = _FoldedConv(cin, cout, N, ksize=ksize, impl=self.conv_impl,
                            dtype=self.dtype, name=f"lay{name}")(x)
            x = _FoldedGroupNorm(cout, N, dtype=self.dtype,
                                 name=f"gn{name}")(x)
            return nn.relu(x)

        def upsample_to(x, h, w):
            B_, hh, ww, c = x.shape
            return jnp.repeat(jnp.repeat(x, h // hh, axis=1), w // ww, axis=2)

        def tile_q(f):
            # [B, h, w, c] -> [B, h, w, N*c]: per-image tensors broadcast
            # across the folded query blocks (channel-tile, not batch-repeat).
            return jnp.tile(f, (1, 1, 1, N))

        # att [B,N,nh,h,w] -> folded [B,h,w,N*nh]
        att_f = att.transpose(0, 3, 4, 1, 2).reshape(
            B, src.shape[1], src.shape[2], N * nh)
        x = _FoldedSplitConv(D, nh, self.dim, N, impl=self.conv_impl,
                             dtype=self.dtype, name="lay1")(src, att_f)
        x = nn.relu(_FoldedGroupNorm(self.dim, N, dtype=self.dtype,
                                     name="gn1")(x))
        x = conv_gn(x, self.dim, inter[1], "2")

        a1 = tile_q(nn.Conv(inter[1], (1, 1), dtype=self.dtype,
                            name="adapter1")(fpn_c4))
        x = a1 + upsample_to(x, a1.shape[1], a1.shape[2])
        x = conv_gn(x, inter[1], inter[2], "3")

        a2 = tile_q(nn.Conv(inter[2], (1, 1), dtype=self.dtype,
                            name="adapter2")(fpn_c3))
        x = a2 + upsample_to(x, a2.shape[1], a2.shape[2])
        x = conv_gn(x, inter[2], inter[3], "4")

        a3 = tile_q(nn.Conv(inter[3], (1, 1), dtype=self.dtype,
                            name="adapter3")(fpn_c2))
        x = a3 + upsample_to(x, a3.shape[1], a3.shape[2])
        x = conv_gn(x, inter[3], inter[4], "5")

        y = _FoldedConv(inter[4], 1, N, impl=self.conv_impl,
                        dtype=jnp.float32, name="out_lay")(x)
        # Folded [B, h4, w4, N] -> flat [B*N, h4, w4, 1] (the flat contract).
        h4, w4 = y.shape[1], y.shape[2]
        return y.transpose(0, 3, 1, 2).reshape(B * N, h4, w4, 1)
