"""torch -> JAX checkpoint converter for published MDETR/TOIST weights.

Maps the reference's state_dict layout (models/mdetr.py MDETR + models/transformer.py
Transformer + torchvision ResNet FrozenBN backbone + HF RobertaModel + the
segmentation head, checkpoint format main.py:641-652) onto this framework's param /
frozen pytrees. Handles (SURVEY.md §7 hard part 3):

  * torch Linear [out,in] -> flax Dense kernel [in,out] (transpose)
  * torch Conv2d [out,in,kh,kw] -> flax Conv kernel [kh,kw,in,out]
  * nn.MultiheadAttention packed in_proj [3D,D] -> separate q/k/v projections
  * FrozenBatchNorm2d buffers -> the 'frozen' collection
  * DDP 'module.' and DETRsegm 'detr.' prefixes stripped (main.py:498-507)
  * EMA-preferred checkpoint keys handled by the caller (checkpoint.load_params)

The input is a plain dict of numpy arrays (load torch .pth via
``torch.load(..., map_location='cpu')`` then ``{k: v.numpy() ...}``) so this module
itself does not depend on torch.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _strip_prefixes(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        for pre in ("module.", "detr."):
            if k.startswith(pre):
                k = k[len(pre):]
        out[k] = np.asarray(v)
    return out


def _lin(sd, key):
    return {"kernel": sd[f"{key}.weight"].T, "bias": sd[f"{key}.bias"]}


def _ln(sd, key):
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def _conv(sd, key, with_bias=False):
    out = {"kernel": sd[f"{key}.weight"].transpose(2, 3, 1, 0)}
    if with_bias:
        out["bias"] = sd[f"{key}.bias"]
    return out


def _gn(sd, key):
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def _frozen_bn(sd, key):
    return {"weight": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"],
            "running_mean": sd[f"{key}.running_mean"],
            "running_var": sd[f"{key}.running_var"]}


def _mha(sd, key, d_model):
    """Packed torch nn.MultiheadAttention -> q/k/v/out projections."""
    w = sd[f"{key}.in_proj_weight"]      # [3D, D]
    b = sd[f"{key}.in_proj_bias"]        # [3D]
    qw, kw, vw = w[:d_model], w[d_model:2 * d_model], w[2 * d_model:]
    qb, kb, vb = b[:d_model], b[d_model:2 * d_model], b[2 * d_model:]
    return {
        "q_proj": {"kernel": qw.T, "bias": qb},
        "k_proj": {"kernel": kw.T, "bias": kb},
        "v_proj": {"kernel": vw.T, "bias": vb},
        "out_proj": _lin(sd, f"{key}.out_proj"),
    }


def _hf_attention(sd, key):
    """HF BertSelfAttention (+output) -> our MultiheadAttention layout."""
    return {
        "q_proj": _lin(sd, f"{key}.self.query"),
        "k_proj": _lin(sd, f"{key}.self.key"),
        "v_proj": _lin(sd, f"{key}.self.value"),
        "out_proj": _lin(sd, f"{key}.output.dense"),
    }


def _resnet(sd, frozen, params, stage_sizes):
    base = "backbone.0.body"
    if f"{base}.conv1.weight" not in sd:
        # Backbone-less state dict (e.g. a model whose backbone is external /
        # stubbed): leave the target's backbone params untouched so callers
        # can overlay the converted transformer+heads onto a fresh init.
        return
    params["backbone"] = {"conv1": _conv(sd, f"{base}.conv1")}
    frozen["backbone"] = {"FrozenBN_0": _frozen_bn(sd, f"{base}.bn1")}
    for s, blocks in enumerate(stage_sizes, start=1):
        for b in range(blocks):
            t = f"{base}.layer{s}.{b}"
            name = f"layer{s}_{b}"
            p = {"conv1": _conv(sd, f"{t}.conv1"),
                 "conv2": _conv(sd, f"{t}.conv2"),
                 "conv3": _conv(sd, f"{t}.conv3")}
            f = {"FrozenBN_0": _frozen_bn(sd, f"{t}.bn1"),
                 "FrozenBN_1": _frozen_bn(sd, f"{t}.bn2"),
                 "FrozenBN_2": _frozen_bn(sd, f"{t}.bn3")}
            if f"{t}.downsample.0.weight" in sd:
                p["downsample_conv"] = _conv(sd, f"{t}.downsample.0")
                f["FrozenBN_3"] = _frozen_bn(sd, f"{t}.downsample.1")
            params["backbone"][name] = p
            frozen["backbone"][name] = f


def _roberta(sd, d_model):
    base = "transformer.text_encoder"
    te = {
        "embeddings": {
            "word_embeddings": {
                "embedding": sd[f"{base}.embeddings.word_embeddings.weight"]},
            "position_embeddings": {
                "embedding": sd[f"{base}.embeddings.position_embeddings.weight"]},
            "token_type_embeddings": {
                "embedding": sd[f"{base}.embeddings.token_type_embeddings.weight"]},
            "LayerNorm": _ln(sd, f"{base}.embeddings.LayerNorm"),
        }
    }
    i = 0
    while f"{base}.encoder.layer.{i}.attention.self.query.weight" in sd:
        t = f"{base}.encoder.layer.{i}"
        te[f"layer_{i}"] = {
            "attention": _hf_attention(sd, f"{t}.attention"),
            "attention_norm": _ln(sd, f"{t}.attention.output.LayerNorm"),
            "intermediate": _lin(sd, f"{t}.intermediate.dense"),
            "output": _lin(sd, f"{t}.output.dense"),
            "output_norm": _ln(sd, f"{t}.output.LayerNorm"),
        }
        i += 1
    if f"{base}.pooler.dense.weight" in sd:
        # HF pooler feeds text_pooled_op on the CLS contrastive path
        # (reference transformer.py:159).
        te["pooler"] = _lin(sd, f"{base}.pooler.dense")
    return te


def convert_torch_state_dict(state_dict: Dict[str, Any], d_model: int = 256,
                             enc_layers: int = 6, dec_layers: int = 6,
                             stage_sizes=(3, 4, 23, 3),
                             with_masks: bool = False
                             ) -> Tuple[Dict, Dict]:
    """Reference state_dict -> (params, frozen) pytrees for TOIST."""
    sd = _strip_prefixes(state_dict)
    params: Dict[str, Any] = {}
    frozen: Dict[str, Any] = {}

    _resnet(sd, frozen, params, stage_sizes)
    params["input_proj"] = _conv(sd, "input_proj", with_bias=True)
    params["query_embed"] = sd["query_embed.weight"]
    params["class_embed"] = _lin(sd, "class_embed")
    params["bbox_embed"] = {
        f"layer{i}": _lin(sd, f"bbox_embed.layers.{i}") for i in range(3)}
    if "contrastive_align_projection_image.weight" in sd:
        params["contrastive_align_projection_image"] = _lin(
            sd, "contrastive_align_projection_image")
        params["contrastive_align_projection_text"] = _lin(
            sd, "contrastive_align_projection_text")
    if "transformer.CLS.weight" in sd:
        # --contrastive_loss CLS token (reference transformer.py:55).
        params["CLS"] = sd["transformer.CLS.weight"]
    if "backbone.1.row_embed.weight" in sd:
        # PositionEmbeddingLearned inside the Joiner (position_encoding.py:52-86).
        params["learned_pos"] = {
            "row_embed": sd["backbone.1.row_embed.weight"],
            "col_embed": sd["backbone.1.col_embed.weight"],
        }

    enc = {}
    for i in range(enc_layers):
        t = f"transformer.encoder.layers.{i}"
        enc[f"layer_{i}"] = {
            "self_attn": _mha(sd, f"{t}.self_attn", d_model),
            "ffn": {"linear1": _lin(sd, f"{t}.linear1"),
                    "linear2": _lin(sd, f"{t}.linear2")},
            "norm1": _ln(sd, f"{t}.norm1"),
            "norm2": _ln(sd, f"{t}.norm2"),
        }
    params["encoder"] = enc

    dec = {"norm": _ln(sd, "transformer.decoder.norm")}
    for i in range(dec_layers):
        t = f"transformer.decoder.layers.{i}"
        dec[f"layer_{i}"] = {
            "self_attn": _mha(sd, f"{t}.self_attn", d_model),
            "cross_attn_image": _mha(sd, f"{t}.cross_attn_image", d_model),
            "ffn": {"linear1": _lin(sd, f"{t}.linear1"),
                    "linear2": _lin(sd, f"{t}.linear2")},
            "norm1": _ln(sd, f"{t}.norm1"),
            "norm3": _ln(sd, f"{t}.norm3"),
            "norm4": _ln(sd, f"{t}.norm4"),
        }
    params["decoder"] = dec

    params["resizer"] = {
        "fc": _lin(sd, "transformer.resizer.fc"),
        "layer_norm": _ln(sd, "transformer.resizer.layer_norm"),
    }
    params["text_encoder"] = _roberta(sd, d_model)

    if with_masks:
        params["bbox_attention"] = {
            "q_linear": _lin(sd, "bbox_attention.q_linear"),
            "k_linear": _lin(sd, "bbox_attention.k_linear"),
        }
        mh = {}
        for i in range(1, 6):
            mh[f"lay{i}"] = _conv(sd, f"mask_head.lay{i}", with_bias=True)
            mh[f"gn{i}"] = _gn(sd, f"mask_head.gn{i}")
        mh["out_lay"] = _conv(sd, "mask_head.out_lay", with_bias=True)
        for i in range(1, 4):
            mh[f"adapter{i}"] = _conv(sd, f"mask_head.adapter{i}",
                                      with_bias=True)
        params["mask_head"] = mh

    # Shapes match TrainState conventions: `params` is the trainable collection
    # tree, the second element is the extra-collections dict for model.apply.
    return params, {"frozen": frozen}


def load_reference_checkpoint(path: str, prefer_ema: bool = True, **kwargs):
    """Load a reference .pth and convert (requires torch at call time)."""
    import torch

    payload = torch.load(path, map_location="cpu")
    key = "model_ema" if (prefer_ema and payload.get("model_ema")) else "model"
    sd = {k: v.detach().numpy() for k, v in payload[key].items()}
    return convert_torch_state_dict(sd, **kwargs)


def synth_reference_state_dict(stage_sizes=(1, 1, 1, 1), enc=1, dec=1,
                               d=16, dim_feedforward=None, text_layers=1,
                               text_hidden=24, text_intermediate=None,
                               num_queries=100, vocab_size=50265,
                               num_logit_cols=256, contrastive=True,
                               contrastive_hdim=64, with_masks=True, seed=0):
    """A state_dict with the reference checkpoint's exact key layout, random
    values (reference main.py:641-652 `payload["model"]` keys as produced by
    `MDETR`/`MDETRsegm`, models/mdetr.py).

    Used by the parity pipeline's fixture dry-run (scripts/run_parity.py) and
    the conversion structure tests: everything downstream of the real data /
    checkpoint drop can be exercised hermetically against this layout.

    Values are random but NUMERICALLY PLAUSIBLE — fan-in-scaled weights,
    positive BN running_var, near-identity norm gains — so the dry-run can
    also TRAIN from the converted checkpoint (the distillation leg of
    run_parity.py runs real steps; unscaled N(0,1) weights blew activations
    up and a normal-distributed running_var is negative half the time, which
    is sqrt(<0) = NaN inside FrozenBatchNorm).
    """
    rng = np.random.default_rng(seed)
    ffn = dim_feedforward if dim_feedforward is not None else 4 * d
    tint = text_intermediate if text_intermediate is not None \
        else 4 * text_hidden
    sd = {}

    def add_lin(key, din, dout):
        sd[f"{key}.weight"] = rng.normal(
            scale=din ** -0.5, size=(dout, din)).astype(np.float32)
        sd[f"{key}.bias"] = rng.normal(
            scale=0.02, size=(dout,)).astype(np.float32)

    def add_conv(key, cin, cout, k, bias=False):
        sd[f"{key}.weight"] = rng.normal(
            scale=(cin * k * k) ** -0.5,
            size=(cout, cin, k, k)).astype(np.float32)
        if bias:
            sd[f"{key}.bias"] = rng.normal(
                scale=0.02, size=(cout,)).astype(np.float32)

    def add_bn(key, c):
        sd[f"{key}.weight"] = rng.uniform(0.5, 1.5, size=(c,)) \
            .astype(np.float32)
        sd[f"{key}.bias"] = rng.normal(scale=0.1, size=(c,)) \
            .astype(np.float32)
        sd[f"{key}.running_mean"] = rng.normal(scale=0.1, size=(c,)) \
            .astype(np.float32)
        sd[f"{key}.running_var"] = rng.uniform(0.5, 1.5, size=(c,)) \
            .astype(np.float32)

    def add_ln(key, c):
        sd[f"{key}.weight"] = rng.uniform(0.8, 1.2, size=(c,)) \
            .astype(np.float32)
        sd[f"{key}.bias"] = rng.normal(scale=0.02, size=(c,)) \
            .astype(np.float32)

    def add_mha(key, dm):
        sd[f"{key}.in_proj_weight"] = rng.normal(
            scale=dm ** -0.5, size=(3 * dm, dm)).astype(np.float32)
        sd[f"{key}.in_proj_bias"] = rng.normal(
            scale=0.02, size=(3 * dm,)).astype(np.float32)
        add_lin(f"{key}.out_proj", dm, dm)

    # Backbone (bottleneck ResNet; widths are architecture constants).
    base = "backbone.0.body"
    add_conv(f"{base}.conv1", 3, 64, 7)
    add_bn(f"{base}.bn1", 64)
    widths = (64, 128, 256, 512)
    cin = 64
    for s, blocks in enumerate(stage_sizes, start=1):
        w = widths[s - 1]
        for b in range(blocks):
            t = f"{base}.layer{s}.{b}"
            add_conv(f"{t}.conv1", cin, w, 1)
            add_bn(f"{t}.bn1", w)
            add_conv(f"{t}.conv2", w, w, 3)
            add_bn(f"{t}.bn2", w)
            add_conv(f"{t}.conv3", w, w * 4, 1)
            add_bn(f"{t}.bn3", w * 4)
            if b == 0:
                add_conv(f"{t}.downsample.0", cin, w * 4, 1)
                add_bn(f"{t}.downsample.1", w * 4)
            cin = w * 4

    # Heads.
    add_conv("input_proj", 2048, d, 1, bias=True)
    sd["query_embed.weight"] = rng.normal(
        scale=0.02, size=(num_queries, d)).astype(np.float32)
    add_lin("class_embed", d, num_logit_cols)
    for i in range(3):
        add_lin(f"bbox_embed.layers.{i}", d, 4 if i == 2 else d)
    if contrastive:
        add_lin("contrastive_align_projection_image", d, contrastive_hdim)
        add_lin("contrastive_align_projection_text", d, contrastive_hdim)

    # Joint transformer.
    for i in range(enc):
        t = f"transformer.encoder.layers.{i}"
        add_mha(f"{t}.self_attn", d)
        add_lin(f"{t}.linear1", d, ffn)
        add_lin(f"{t}.linear2", ffn, d)
        add_ln(f"{t}.norm1", d)
        add_ln(f"{t}.norm2", d)
    for i in range(dec):
        t = f"transformer.decoder.layers.{i}"
        add_mha(f"{t}.self_attn", d)
        add_mha(f"{t}.cross_attn_image", d)
        add_lin(f"{t}.linear1", d, ffn)
        add_lin(f"{t}.linear2", ffn, d)
        add_ln(f"{t}.norm1", d)
        add_ln(f"{t}.norm3", d)
        add_ln(f"{t}.norm4", d)
    add_ln("transformer.decoder.norm", d)
    add_lin("transformer.resizer.fc", text_hidden, d)
    add_ln("transformer.resizer.layer_norm", d)

    # RoBERTa text encoder.
    tb = "transformer.text_encoder"
    sd[f"{tb}.embeddings.word_embeddings.weight"] = rng.normal(
        scale=0.02, size=(vocab_size, text_hidden)).astype(np.float32)
    sd[f"{tb}.embeddings.position_embeddings.weight"] = rng.normal(
        scale=0.02, size=(514, text_hidden)).astype(np.float32)
    sd[f"{tb}.embeddings.token_type_embeddings.weight"] = rng.normal(
        scale=0.02, size=(1, text_hidden)).astype(np.float32)
    add_ln(f"{tb}.embeddings.LayerNorm", text_hidden)
    for i in range(text_layers):
        t = f"{tb}.encoder.layer.{i}"
        for part in ("query", "key", "value"):
            add_lin(f"{t}.attention.self.{part}", text_hidden, text_hidden)
        add_lin(f"{t}.attention.output.dense", text_hidden, text_hidden)
        add_ln(f"{t}.attention.output.LayerNorm", text_hidden)
        add_lin(f"{t}.intermediate.dense", text_hidden, tint)
        add_lin(f"{t}.output.dense", tint, text_hidden)
        add_ln(f"{t}.output.LayerNorm", text_hidden)

    if with_masks:
        add_lin("bbox_attention.q_linear", d, d)
        add_lin("bbox_attention.k_linear", d, d)
        # Mask head conv chain (cin/cout per reference MaskHeadSmallConv,
        # models/segmentation.py:30-51; nheads=8 attention maps concatenated).
        chain = [(d + 8, d + 8), (d + 8, d // 2), (d // 2, d // 4),
                 (d // 4, d // 8), (d // 8, d // 16)]
        for i, (ci, co) in enumerate(chain, start=1):
            add_conv(f"mask_head.lay{i}", ci, co, 3, bias=True)
            add_ln(f"mask_head.gn{i}", co)
        add_conv("mask_head.out_lay", d // 16, 1, 3, bias=True)
        for i, fc in enumerate((1024, 512, 256), start=1):
            add_conv(f"mask_head.adapter{i}",
                     fc, [d // 2, d // 4, d // 8][i - 1], 1, bias=True)
    return sd
