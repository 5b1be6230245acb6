"""ResNet backbone with frozen BatchNorm, NHWC, in flax.linen.

Behavioral spec: /root/reference/models/backbone.py — FrozenBatchNorm2d (buffers only,
eps inside rsqrt, :21-58), layer1 frozen, optional last-block dilation (:83-91),
returns C2..C5 when masks are on else C5 only (:61-80), per-level padding masks by
nearest-downsampling the image pad mask (:78).

TPU-first divergences: NHWC layout (XLA:TPU's native conv layout), norm layer is
configurable — "frozen_bn" reproduces the reference exactly (an affine with precomputed
scale/bias, what FrozenBN reduces to), "group_norm" enables from-scratch training
(the reference's GroupNormBackbone variant, backbone.py:99-114). Freezing of layer1 is
handled by optimizer param-group masking, not by the module.
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class FrozenBN(nn.Module):
    """y = x * scale + bias with non-trainable statistics.

    Parameters mirror torch FrozenBatchNorm2d buffers (weight, bias, running_mean,
    running_var); forward computes weight * rsqrt(var + eps) * x + (bias - mean * s),
    eps inside the rsqrt like backbone.py:52-58.
    """
    features: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        init1 = nn.initializers.ones
        init0 = nn.initializers.zeros
        weight = self.variable("frozen", "weight", init1, None, (self.features,))
        bias = self.variable("frozen", "bias", init0, None, (self.features,))
        mean = self.variable("frozen", "running_mean", init0, None, (self.features,))
        var = self.variable("frozen", "running_var", init1, None, (self.features,))
        scale = weight.value / jnp.sqrt(var.value + self.eps)
        shift = bias.value - mean.value * scale
        return x * scale.astype(self.dtype) + shift.astype(self.dtype)


def _norm(norm_type: str, features: int, dtype):
    if norm_type == "frozen_bn":
        return FrozenBN(features, dtype=dtype)
    if norm_type == "group_norm":
        return nn.GroupNorm(num_groups=32, dtype=dtype)
    raise ValueError(norm_type)


class StemConv(nn.Module):
    """The 7x7 stride-2 pad-3 input conv, computed via 2x2 space-to-depth.

    Identical arithmetic to the plain conv (torchvision resnet conv1,
    reference backbone.py stem): output[y,x] = sum_{dy,dx in -3..3}
    K[dy,dx] * I[2y+dy, 2x+dx]. Rewriting it as a 4x4 stride-1 conv over the
    2x2 space-to-depth input lifts the input-channel count 3 -> 12 and lets
    XLA:TPU skip the H-major relayout + pad + copy chain it emits for raw
    3-channel convs (~19ms/step of pure data movement at the flagship batch-6
    832x1344 shape, profiled on v5e). The parameter keeps the torch (7,7,3,F)
    layout so checkpoints/converters are unaffected; the rearrange below is
    K4[j,i,(r,c,ch),o] = K7[2j+r-4, 2i+c-4, ch, o] (out-of-range taps are 0),
    with cell-level padding (2,1) reproducing the pixel-level pad of 3.
    Exactness is tested against the plain conv in tests/test_model_forward.py.
    """
    features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, 3, self.features))
        k = kernel.astype(self.dtype)
        x = x.astype(self.dtype)  # nn.Conv-style input promotion
        B, H, W, C = x.shape
        dn = ("NHWC", "HWIO", "NHWC")
        if H % 2 or W % 2:
            return jax.lax.conv_general_dilated(
                x, k, (2, 2), ((3, 3), (3, 3)), dimension_numbers=dn)
        # (r, c)-major channel packing. NB measured on v5e: this 6-D
        # reshape/transpose beats the equivalent strided-slice+concat form
        # (203.7 vs 175.8 eval img/s).
        xs = x.reshape(B, H // 2, 2, W // 2, 2, C)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
        k7 = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))       # taps -4..3
        k4 = k7.reshape(4, 2, 4, 2, C, self.features)
        k4 = k4.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * C,
                                                    self.features)
        return jax.lax.conv_general_dilated(
            xs, k4, (1, 1), ((2, 1), (2, 1)), dimension_numbers=dn)


class Bottleneck(nn.Module):
    features: int           # bottleneck width; output = features * 4
    strides: int = 1
    dilation: int = 1
    norm_type: str = "frozen_bn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        out = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = _norm(self.norm_type, self.features, self.dtype)(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                      padding=[(self.dilation, self.dilation)] * 2,
                      kernel_dilation=(self.dilation, self.dilation),
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = _norm(self.norm_type, self.features, self.dtype)(out)
        out = nn.relu(out)
        out = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = _norm(self.norm_type, self.features * 4, self.dtype)(out)
        if residual.shape[-1] != self.features * 4 or self.strides != 1:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = _norm(self.norm_type, self.features * 4,
                             self.dtype)(residual)
        return nn.relu(out + residual)


class ResNet(nn.Module):
    """ResNet-50/101 trunk emitting {layer1..layer4} feature maps (NHWC).

    When ``pad_mask`` ([B, H, W] bool, True = padding) is given, features in the
    padded canvas region are zeroed after the stem and after every stage. This
    makes outputs exactly invariant to canvas size under zero padding — a
    property the reference does NOT have (its max-pool/conv windows leak image
    values into the padded region, so its outputs depend on per-batch padding),
    and which static bucketed batching relies on for determinism.
    """
    stage_sizes: Sequence[int] = (3, 4, 23, 3)  # resnet101
    norm_type: str = "frozen_bn"
    dilation: bool = False                       # dilate last stage (backbone.py:88)
    dtype: Any = jnp.float32
    remat: bool = False                          # checkpoint each bottleneck block

    @nn.compact
    def __call__(self, x, pad_mask=None) -> Dict[str, jnp.ndarray]:
        def apply_mask(feat):
            if pad_mask is None:
                return feat
            fh, fw = feat.shape[1], feat.shape[2]
            # Multiply by a {0,1} keep-mask instead of where(pred, 0, x):
            # the pred tensor materialization + select chains cost ~18ms/step
            # at flagship shapes (profiled v5e); a bf16 multiply fuses into
            # the adjacent conv epilogue.
            keep = 1.0 - downsample_mask(pad_mask, fh, fw).astype(feat.dtype)
            return feat * keep[..., None]

        x = StemConv(64, dtype=self.dtype, name="conv1")(x)
        x = _norm(self.norm_type, 64, self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        x = apply_mask(x)
        feats = {}
        widths = (64, 128, 256, 512)
        for si, (blocks, width) in enumerate(zip(self.stage_sizes, widths)):
            last = si == len(self.stage_sizes) - 1
            stride = 1 if si == 0 or (last and self.dilation) else 2
            dil = 2 if (last and self.dilation) else 1
            block_cls = nn.remat(Bottleneck) if self.remat else Bottleneck
            for bi in range(blocks):
                x = block_cls(width,
                              strides=stride if bi == 0 else 1,
                              dilation=dil,
                              norm_type=self.norm_type, dtype=self.dtype,
                              name=f"layer{si + 1}_{bi}")(x)
            x = apply_mask(x)
            feats[f"layer{si + 1}"] = x
        return feats


def resnet_num_channels() -> int:
    return 2048


def make_resnet(name: str, norm_type: str, dilation: bool, dtype,
                remat: bool = False) -> ResNet:
    sizes = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3),
             "resnet18-test": (1, 1, 1, 1)}
    if name.startswith("timm_"):
        # Reference backbone.py:117-162 wraps arbitrary timm models behind
        # --backbone timm_<name> with BN rewritten to FrozenBN; MDETR's
        # published use of that path is the EfficientNet family
        # (tf_efficientnet_b3_ns / _b5_ns), implemented natively in
        # models/efficientnet.py. Other timm families fail loudly rather
        # than silently substituting.
        from toist_tpu.models.efficientnet import (make_efficientnet,
                                                   parse_timm_efficientnet)
        variant = parse_timm_efficientnet(name)
        if variant is not None:
            return make_efficientnet(variant, norm_type, dtype, remat=remat)
        raise ValueError(
            f"timm backbone {name} is not available in toist_tpu; supported: "
            "resnet50/resnet101 and timm_[tf_]efficientnet_b0..b5 "
            "(models/efficientnet.py)")
    if name not in sizes:
        raise ValueError(f"unknown backbone {name}")
    return ResNet(stage_sizes=sizes[name], norm_type=norm_type,
                  dilation=dilation, dtype=dtype, remat=remat)


def downsample_mask(mask: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Image pad mask [B, H, W] bool -> feature-level mask [B, h, w].

    Reference interpolates the float mask (backbone.py:78); nearest sampling at
    feature-cell top-left corners is equivalent for block padding."""
    B, H, W = mask.shape
    if H % h == 0 and W % w == 0:
        # Exact-stride canvases (all /32 buckets): a strided slice, not a
        # gather — gathers of the full-res bool mask cost ~5ms/step profiled.
        return mask[:, ::H // h, ::W // w]
    ys = (jnp.arange(h) * (H / h)).astype(jnp.int32)
    xs = (jnp.arange(w) * (W / w)).astype(jnp.int32)
    return mask[:, ys][:, :, xs]
