"""Pretrained-weight ingestion: torchvision ResNet + HF RoBERTa state dicts.

The reference builds from pretrained weights by default — torchvision ImageNet
ResNet-101 (/root/reference/models/backbone.py:83-91, pretrained=is_main_process())
and HF roberta-base (/root/reference/models/transformer.py:59-64). utils/convert.py
handles FULL TOIST/MDETR checkpoints; this module converts the two BARE upstream
state dicts so training-from-reference-init is reachable:

  convert_torchvision_resnet: torchvision `resnet101().state_dict()` layout
      (conv1/bn1/layerS.B.convN/bnN/downsample.{0,1}) -> (params, frozen)
      subtrees for models/resnet.ResNet (NHWC, FrozenBN collection).
  convert_hf_roberta: HF `RobertaModel.state_dict()` layout -> the
      text_encoder params subtree for models/text_encoder.RobertaEncoder.

Weight files can't be downloaded in this environment; these converters plus
their layout/numeric-parity tests (tests/test_pretrained.py) make ingestion a
file-drop: point run.pretrained_backbone / run.pretrained_text at the .pth.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from toist_tpu.utils import convert

STAGE_SIZES = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3),
               "resnet18-test": (1, 1, 1, 1)}


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch .pth/.bin (requires torch) or a numpy .npz of arrays."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(payload, dict) and "state_dict" in payload:
        payload = payload["state_dict"]
    return {k: v.detach().numpy() for k, v in payload.items()
            if hasattr(v, "detach")}


def convert_torchvision_resnet(state_dict: Dict[str, Any],
                               stage_sizes=(3, 4, 23, 3)
                               ) -> Tuple[Dict, Dict]:
    """Bare torchvision ResNet state_dict -> (params, frozen) backbone subtrees.

    The classifier head (fc.*) and num_batches_tracked buffers are dropped,
    mirroring what IntermediateLayerGetter discards in the reference
    (backbone.py:74-76)."""
    sd = {f"backbone.0.body.{k}": np.asarray(v) for k, v in state_dict.items()
          if not k.startswith("fc.") and "num_batches_tracked" not in k}
    params: Dict[str, Any] = {}
    frozen: Dict[str, Any] = {}
    convert._resnet(sd, frozen, params, stage_sizes)
    return params["backbone"], frozen["backbone"]


def _t_conv(w: np.ndarray) -> np.ndarray:
    """torch conv weight [O, I, kh, kw] -> flax NHWC kernel [kh, kw, I, O].

    The same transpose covers depthwise convs: torch groups=C stores
    [C, 1, kh, kw]; flax feature_group_count=C expects [kh, kw, 1, C]."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def convert_timm_efficientnet(state_dict: Dict[str, Any]
                              ) -> Tuple[Dict, Dict]:
    """Bare timm EfficientNet state_dict -> (params, frozen) backbone subtrees.

    Mirrors the reference TimmBackbone ingestion (backbone.py:117-130): timm
    `efficientnet_bX` trunk weights with every BatchNorm frozen (replace_bn ->
    our FrozenBN 'frozen' collection). The classifier head (conv_head/bn2 at
    top level past the blocks, classifier.*) is dropped, as features_only
    does. Naming map: timm `blocks.S.B` -> `stageS+1_B`; DepthwiseSeparable
    blocks (stage 0, no expansion) store their projection as `conv_pw`/`bn2`
    in timm but `conv_pwl`/`bn2` here; SE convs `se.conv_reduce/expand` ->
    `se_reduce/se_expand`. Conv weights transpose OIHW -> HWIO."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()
          if "num_batches_tracked" not in k}
    params: Dict[str, Any] = {"conv_stem": {"kernel": _t_conv(
        sd["conv_stem.weight"])}}
    frozen: Dict[str, Any] = {}

    def bn(prefix: str) -> Dict[str, np.ndarray]:
        return {stat: sd[f"{prefix}.{stat}"] for stat in
                ("weight", "bias", "running_mean", "running_var")}

    frozen["bn1"] = bn("bn1")
    s = 0
    while f"blocks.{s}.0.conv_dw.weight" in sd:
        b = 0
        while f"blocks.{s}.{b}.conv_dw.weight" in sd:
            src = f"blocks.{s}.{b}"
            name = f"stage{s + 1}_{b}"
            is_ir = f"{src}.conv_pwl.weight" in sd  # InvertedResidual
            p = {"conv_dw": {"kernel": _t_conv(sd[f"{src}.conv_dw.weight"])},
                 "se_reduce": {
                     "kernel": _t_conv(sd[f"{src}.se.conv_reduce.weight"]),
                     "bias": sd[f"{src}.se.conv_reduce.bias"]},
                 "se_expand": {
                     "kernel": _t_conv(sd[f"{src}.se.conv_expand.weight"]),
                     "bias": sd[f"{src}.se.conv_expand.bias"]}}
            f = {}
            if is_ir:
                p["conv_pw"] = {"kernel": _t_conv(sd[f"{src}.conv_pw.weight"])}
                p["conv_pwl"] = {
                    "kernel": _t_conv(sd[f"{src}.conv_pwl.weight"])}
                f["bn1"], f["bn2"], f["bn3"] = (bn(f"{src}.bn1"),
                                                bn(f"{src}.bn2"),
                                                bn(f"{src}.bn3"))
            else:
                p["conv_pwl"] = {
                    "kernel": _t_conv(sd[f"{src}.conv_pw.weight"])}
                f["bn1"], f["bn2"] = bn(f"{src}.bn1"), bn(f"{src}.bn2")
            params[name], frozen[name] = p, f
            b += 1
        s += 1
    if s == 0:
        raise ValueError("state_dict has no timm EfficientNet blocks.*")
    return params, frozen


def convert_hf_roberta(state_dict: Dict[str, Any],
                       keep_pooler: bool = False) -> Dict:
    """Bare HF RobertaModel state_dict -> text_encoder params subtree.

    The pooler is dropped unless keep_pooler (the CLS contrastive path uses
    pooler_output, reference transformer.py:159; the plain path only consumes
    last_hidden_state, transformer.py:133)."""
    sd = {f"transformer.text_encoder.{k}": np.asarray(v)
          for k, v in state_dict.items()
          if keep_pooler or not k.startswith("pooler.")}
    return convert._roberta(sd, d_model=None)


def _check_same_shapes(dst: Any, src: Any, path: str = "") -> None:
    if isinstance(dst, dict) or isinstance(src, dict):
        dkeys = set(dst) if isinstance(dst, dict) else set()
        skeys = set(src) if isinstance(src, dict) else set()
        if dkeys != skeys:
            raise ValueError(
                f"pretrained tree mismatch at {path or '<root>'}: "
                f"missing={sorted(dkeys - skeys)} extra={sorted(skeys - dkeys)}")
        for k in dkeys:
            _check_same_shapes(dst[k], src[k], f"{path}/{k}")
        return
    ds, ss = tuple(np.shape(dst)), tuple(np.shape(src))
    if ds != ss:
        raise ValueError(f"pretrained shape mismatch at {path}: {ss} vs {ds}")


def apply_pretrained(cfg, params: Dict, frozen: Dict) -> Tuple[Dict, Dict]:
    """Overlay configured pretrained weights onto initialized trees.

    cfg is the full Config; honors model.without_pretrain (reference
    main.py:256 / transformer.py:60-62: random init instead of pretrained)."""
    if cfg.model.without_pretrain:
        return params, frozen
    if cfg.run.pretrained_backbone:
        if cfg.model.backbone.startswith("timm_"):
            bp, bf = convert_timm_efficientnet(
                load_state_dict(cfg.run.pretrained_backbone))
        else:
            bp, bf = convert_torchvision_resnet(
                load_state_dict(cfg.run.pretrained_backbone),
                stage_sizes=STAGE_SIZES[cfg.model.backbone])
        _check_same_shapes(params["backbone"], bp, "params/backbone")
        params = {**params, "backbone": bp}
        if cfg.model.backbone_norm == "frozen_bn":
            _check_same_shapes(frozen["frozen"]["backbone"], bf,
                               "frozen/backbone")
            frozen = dict(frozen)
            frozen["frozen"] = {**frozen["frozen"], "backbone": bf}
    if cfg.run.pretrained_text:
        te = convert_hf_roberta(load_state_dict(cfg.run.pretrained_text),
                                keep_pooler=cfg.model.contrastive_loss)
        _check_same_shapes(params["text_encoder"], te, "params/text_encoder")
        params = {**params, "text_encoder": te}
    return params, frozen
