"""EfficientNet backbone family (NHWC, flax.linen) — the TimmBackbone variant.

Behavioral spec: /root/reference/models/backbone.py:117-162 (TimmBackbone) wraps
an arbitrary timm model with ``features_only, out_indices=(1, 2, 3, 4)`` and
rewrites every BatchNorm to FrozenBatchNorm2d (replace_bn, :117-130). In
practice the timm path exists for MDETR's published EfficientNet backbones
(``timm_tf_efficientnet_b3_ns`` / ``_b5_ns``); this module implements that
family natively so the capability survives without timm: an
EfficientNet-B0..B5 trunk with frozen BatchNorm (or GroupNorm), emitting the
same four feature levels at reductions 4/8/16/32 under the backbone contract
of models/resnet.ResNet ({layer1..layer4}, per-stage pad masking).

TPU-first notes: depthwise convs use feature_group_count (XLA:TPU lowers these
to VPU-friendly fused loops), SiLU activations fuse into the conv epilogues,
and squeeze-excite's global pool runs over the *valid* (non-padded) region via
the pad mask so outputs stay exactly canvas-invariant — a property the timm
original does not have (its global average pool leaks padding).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from toist_tpu.models.resnet import FrozenBN, downsample_mask


def _norm(norm_type: str, features: int, dtype, name=None):
    """Like resnet._norm, but EfficientNet channel counts (16, 24, 40, ...)
    are rarely divisible by 32; pick the largest power-of-two group count
    that divides the channels (gcd with 32), mirroring timm's
    group_normalization fallback behavior."""
    if norm_type == "frozen_bn":
        return FrozenBN(features, dtype=dtype, name=name)
    if norm_type == "group_norm":
        return nn.GroupNorm(num_groups=math.gcd(features, 32), dtype=dtype,
                            name=name)
    raise ValueError(norm_type)

# Base (B0) stage table: (expand_ratio, kernel, stride, out_channels, repeats).
# EfficientNet paper table 1 / timm efficientnet_b0 defaults.
_B0_STAGES: Tuple[Tuple[int, int, int, int, int], ...] = (
    (1, 3, 1, 16, 1),
    (6, 3, 2, 24, 2),
    (6, 5, 2, 40, 2),
    (6, 3, 2, 80, 3),
    (6, 5, 1, 112, 3),
    (6, 5, 2, 192, 4),
    (6, 3, 1, 320, 1),
)

# (width_mult, depth_mult) per variant (timm/paper compound scaling).
_VARIANTS = {
    "b0": (1.0, 1.0), "b1": (1.0, 1.1), "b2": (1.1, 1.2),
    "b3": (1.2, 1.4), "b4": (1.4, 1.8), "b5": (1.6, 2.2),
}


def _round_filters(f: int, width_mult: float, divisor: int = 8) -> int:
    f = f * width_mult
    new_f = max(divisor, int(f + divisor / 2) // divisor * divisor)
    if new_f < 0.9 * f:
        new_f += divisor
    return int(new_f)


def _round_repeats(r: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * r))


class MBConv(nn.Module):
    """Mobile inverted bottleneck with squeeze-excite.

    expand 1x1 -> depthwise kxk (stride) -> SE -> project 1x1, residual when
    shapes match. SE pools over valid pixels only (``valid`` = [B,h,w,1] keep
    mask) so padded canvases don't shift channel statistics."""
    in_ch: int
    out_ch: int
    expand: int
    kernel: int
    strides: int
    norm_type: str = "frozen_bn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, valid=None):
        # Norm names follow timm's per-block layout (InvertedResidual:
        # bn1/bn2/bn3; DepthwiseSeparableConv when expand==1: bn1/bn2) so
        # utils/pretrained.convert_timm_efficientnet is a pure rename.
        mid = self.in_ch * self.expand
        h = x
        bn = 1
        if self.expand != 1:
            h = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        name="conv_pw")(h)
            h = _norm(self.norm_type, mid, self.dtype, name=f"bn{bn}")(h)
            bn += 1
            h = nn.silu(h)
        # The depthwise conv is the only op here with a spatial receptive
        # field: zero the padded region first so boundary outputs read the
        # same zeros a smaller canvas's conv padding would provide (exact
        # canvas invariance; norm bias makes padded features nonzero
        # otherwise). Pointwise convs/SE/residual cannot leak across the
        # boundary, so one mask per block suffices.
        if valid is not None:
            h = h * valid.astype(h.dtype)
        p = self.kernel // 2
        h = nn.Conv(mid, (self.kernel, self.kernel),
                    strides=(self.strides, self.strides),
                    padding=[(p, p), (p, p)], feature_group_count=mid,
                    use_bias=False, dtype=self.dtype, name="conv_dw")(h)
        h = _norm(self.norm_type, mid, self.dtype, name=f"bn{bn}")(h)
        bn += 1
        h = nn.silu(h)
        # Squeeze-excite: reduce to se_ch = in_ch // 4 (timm se_ratio 0.25 of
        # the block INPUT channels), sigmoid gate.
        se_ch = max(1, self.in_ch // 4)
        if valid is not None:
            vh = valid[:, ::self.strides, ::self.strides, :]
            vh = vh[:, :h.shape[1], :h.shape[2], :]  # odd-dim stride guard
            denom = jnp.maximum(vh.sum(axis=(1, 2), keepdims=True), 1.0)
            pooled = (h * vh.astype(h.dtype)).sum(axis=(1, 2), keepdims=True) \
                / denom.astype(h.dtype)
        else:
            pooled = h.mean(axis=(1, 2), keepdims=True)
        se = nn.Conv(se_ch, (1, 1), dtype=self.dtype, name="se_reduce")(pooled)
        se = nn.silu(se)
        se = nn.Conv(mid, (1, 1), dtype=self.dtype, name="se_expand")(se)
        h = h * nn.sigmoid(se)
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_pwl")(h)
        h = _norm(self.norm_type, self.out_ch, self.dtype, name=f"bn{bn}")(h)
        if self.strides == 1 and self.in_ch == self.out_ch:
            h = h + x
        return h


class EfficientNet(nn.Module):
    """EfficientNet trunk emitting {layer1..layer4} at reductions 4/8/16/32.

    Same calling convention as models/resnet.ResNet: __call__(x, pad_mask)
    with pad_mask [B, H, W] bool (True = padding); features in padded regions
    are zeroed after the stem and every tapped stage (canvas invariance)."""
    width_mult: float = 1.0
    depth_mult: float = 1.0
    norm_type: str = "frozen_bn"
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, pad_mask=None) -> Dict[str, jnp.ndarray]:
        def keep_mask(feat):
            if pad_mask is None:
                return None
            fh, fw = feat.shape[1], feat.shape[2]
            k = 1.0 - downsample_mask(pad_mask, fh, fw).astype(feat.dtype)
            return k[..., None]

        def apply_mask(feat):
            k = keep_mask(feat)
            return feat if k is None else feat * k

        stem_ch = _round_filters(32, self.width_mult)
        x = nn.Conv(stem_ch, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="conv_stem")(x)
        x = _norm(self.norm_type, stem_ch, self.dtype, name="bn1")(x)
        x = nn.silu(x)
        x = apply_mask(x)

        feats: Dict[str, jnp.ndarray] = {}
        in_ch = stem_ch
        tap = 0
        # Taps: the LAST stage at each reduction 4/8/16/32 = after stages
        # 2, 3, 5, 7 (timm features_only out_indices=(1,2,3,4)).
        taps_after = {1: None, 2: "layer1", 3: "layer2", 4: None,
                      5: "layer3", 6: None, 7: "layer4"}
        block_cls = nn.remat(MBConv) if self.remat else MBConv
        for si, (exp, k, s, ch, reps) in enumerate(_B0_STAGES, start=1):
            out_ch = _round_filters(ch, self.width_mult)
            for bi in range(_round_repeats(reps, self.depth_mult)):
                x = block_cls(in_ch, out_ch, exp, k,
                              s if bi == 0 else 1,
                              norm_type=self.norm_type, dtype=self.dtype,
                              name=f"stage{si}_{bi}")(x, keep_mask(x))
                in_ch = out_ch
            name = taps_after[si]
            if name is not None:
                x = apply_mask(x)
                feats[name] = x
        return feats


def efficientnet_num_channels(variant: str) -> int:
    """Channels of the stride-32 feature (timm feature_info.channels()[-1])."""
    w, _ = _VARIANTS[variant]
    return _round_filters(320, w)


def parse_timm_efficientnet(name: str) -> Optional[str]:
    """'timm_tf_efficientnet_b3_ns' / 'timm_efficientnet_b0' -> 'b3' / 'b0'.

    Returns None if the timm name is not an EfficientNet this module covers."""
    base = name[len("timm_"):] if name.startswith("timm_") else name
    for tok in base.split("_"):
        if tok in _VARIANTS:
            return tok
    return None


def make_efficientnet(variant: str, norm_type: str, dtype,
                      remat: bool = False) -> EfficientNet:
    w, d = _VARIANTS[variant]
    return EfficientNet(width_mult=w, depth_mult=d, norm_type=norm_type,
                        dtype=dtype, remat=remat)
