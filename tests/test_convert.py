"""Checkpoint converter tests: numeric parity against real torch modules and
full-tree coverage for the flagship layout."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn

from toist_tpu.models.layers import MultiheadAttention
from toist_tpu.utils.convert import (_mha, _lin, _conv, convert_torch_state_dict)


def test_linear_parity():
    lin = nn.Linear(12, 7)
    sd = {f"l.{k}": v.detach().numpy() for k, v in lin.state_dict().items()}
    p = _lin(sd, "l")
    x = np.random.default_rng(0).normal(size=(3, 12)).astype(np.float32)
    want = lin(torch.from_numpy(x)).detach().numpy()
    got = x @ p["kernel"] + p["bias"]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv_parity():
    conv = nn.Conv2d(3, 5, 3, padding=1)
    sd = {f"c.{k}": v.detach().numpy() for k, v in conv.state_dict().items()}
    p = _conv(sd, "c", with_bias=True)
    x = np.random.default_rng(1).normal(size=(1, 3, 8, 8)).astype(np.float32)
    want = conv(torch.from_numpy(x)).detach().numpy()  # NCHW
    import flax.linen as fnn
    mod = fnn.Conv(5, (3, 3), padding=1)
    got = mod.apply({"params": p}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=1e-4)


def test_multihead_attention_parity():
    """Packed torch nn.MultiheadAttention == our MultiheadAttention after
    conversion, including key padding masks."""
    D, H, B, Q, S = 32, 4, 2, 5, 7
    tmha = nn.MultiheadAttention(D, H, batch_first=True)
    sd = {f"a.{k}": v.detach().numpy() for k, v in tmha.state_dict().items()}
    p = _mha(sd, "a", D)

    rng = np.random.default_rng(2)
    q = rng.normal(size=(B, Q, D)).astype(np.float32)
    k = rng.normal(size=(B, S, D)).astype(np.float32)
    v = rng.normal(size=(B, S, D)).astype(np.float32)
    kpm = np.zeros((B, S), bool)
    kpm[:, -2:] = True

    want, _ = tmha(torch.from_numpy(q), torch.from_numpy(k),
                   torch.from_numpy(v),
                   key_padding_mask=torch.from_numpy(kpm))
    mod = MultiheadAttention(D, H)
    got = mod.apply({"params": p}, jnp.asarray(q), jnp.asarray(k),
                    jnp.asarray(v), key_padding_mask=jnp.asarray(kpm))
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               atol=2e-5)


def _synth_reference_state_dict(stage_sizes=(1, 1, 1, 1), enc=1, dec=1,
                                d=16, text_layers=1, text_hidden=24,
                                with_masks=True):
    """A state_dict with the reference's exact key layout, random values."""
    rng = np.random.default_rng(0)
    sd = {}

    def add_lin(key, din, dout):
        sd[f"{key}.weight"] = rng.normal(size=(dout, din)).astype(np.float32)
        sd[f"{key}.bias"] = rng.normal(size=(dout,)).astype(np.float32)

    def add_conv(key, cin, cout, k, bias=False):
        sd[f"{key}.weight"] = rng.normal(
            size=(cout, cin, k, k)).astype(np.float32)
        if bias:
            sd[f"{key}.bias"] = rng.normal(size=(cout,)).astype(np.float32)

    def add_bn(key, c):
        for suffix in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{key}.{suffix}"] = rng.normal(size=(c,)).astype(np.float32)

    def add_ln(key, c):
        sd[f"{key}.weight"] = rng.normal(size=(c,)).astype(np.float32)
        sd[f"{key}.bias"] = rng.normal(size=(c,)).astype(np.float32)

    def add_mha(key, dm):
        sd[f"{key}.in_proj_weight"] = rng.normal(
            size=(3 * dm, dm)).astype(np.float32)
        sd[f"{key}.in_proj_bias"] = rng.normal(size=(3 * dm,)).astype(np.float32)
        add_lin(f"{key}.out_proj", dm, dm)

    # backbone
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
    # heads
    add_conv("input_proj", 2048, d, 1, bias=True)
    sd["query_embed.weight"] = rng.normal(size=(100, d)).astype(np.float32)
    add_lin("class_embed", d, 256)
    for i in range(3):
        add_lin(f"bbox_embed.layers.{i}", d, 4 if i == 2 else d)
    add_lin("contrastive_align_projection_image", d, 64)
    add_lin("contrastive_align_projection_text", d, 64)
    # transformer
    for i in range(enc):
        t = f"transformer.encoder.layers.{i}"
        add_mha(f"{t}.self_attn", d)
        add_lin(f"{t}.linear1", d, 4 * d)
        add_lin(f"{t}.linear2", 4 * d, d)
        add_ln(f"{t}.norm1", d)
        add_ln(f"{t}.norm2", d)
    for i in range(dec):
        t = f"transformer.decoder.layers.{i}"
        add_mha(f"{t}.self_attn", d)
        add_mha(f"{t}.cross_attn_image", d)
        add_lin(f"{t}.linear1", d, 4 * d)
        add_lin(f"{t}.linear2", 4 * d, d)
        add_ln(f"{t}.norm1", d)
        add_ln(f"{t}.norm3", d)
        add_ln(f"{t}.norm4", d)
    add_ln("transformer.decoder.norm", d)
    add_lin("transformer.resizer.fc", text_hidden, d)
    add_ln("transformer.resizer.layer_norm", d)
    # roberta
    tb = "transformer.text_encoder"
    sd[f"{tb}.embeddings.word_embeddings.weight"] = rng.normal(
        size=(50265, text_hidden)).astype(np.float32)
    sd[f"{tb}.embeddings.position_embeddings.weight"] = rng.normal(
        size=(514, text_hidden)).astype(np.float32)
    sd[f"{tb}.embeddings.token_type_embeddings.weight"] = rng.normal(
        size=(1, text_hidden)).astype(np.float32)
    add_ln(f"{tb}.embeddings.LayerNorm", text_hidden)
    for i in range(text_layers):
        t = f"{tb}.encoder.layer.{i}"
        for part in ("query", "key", "value"):
            add_lin(f"{t}.attention.self.{part}", text_hidden, text_hidden)
        add_lin(f"{t}.attention.output.dense", text_hidden, text_hidden)
        add_ln(f"{t}.attention.output.LayerNorm", text_hidden)
        add_lin(f"{t}.intermediate.dense", text_hidden, 4 * text_hidden)
        add_lin(f"{t}.output.dense", 4 * text_hidden, text_hidden)
        add_ln(f"{t}.output.LayerNorm", text_hidden)
    if with_masks:
        add_lin("bbox_attention.q_linear", d, d)
        add_lin("bbox_attention.k_linear", d, d)
        dims = [d + 8, d // 2, d // 4, d // 8, d // 16]
        for i in range(1, 6):
            cin_m = dims[i - 1] if i > 1 else d + 8
            cout_m = dims[i - 1] if i == 1 else dims[i - 1]
        # mask head conv chain (cin/cout per reference MaskHeadSmallConv)
        chain = [(d + 8, d + 8), (d + 8, d // 2), (d // 2, d // 4),
                 (d // 4, d // 8), (d // 8, d // 16)]
        for i, (ci, co) in enumerate(chain, start=1):
            add_conv(f"mask_head.lay{i}", ci, co, 3, bias=True)
            add_ln(f"mask_head.gn{i}", co)
        add_conv("mask_head.out_lay", d // 16, 1, 3, bias=True)
        for i, fc in enumerate((1024, 512, 256), start=1):
            add_conv(f"mask_head.adapter{i}", fc, [d // 2, d // 4, d // 8][i - 1],
                     1, bias=True)
    return sd


def test_full_tree_conversion_structure():
    """Converted tree matches the model's init tree: same paths, same shapes."""
    import __graft_entry__
    from toist_tpu.config import ModelConfig
    from toist_tpu.models.toist import build_model

    d = 128
    cfg = ModelConfig(backbone="resnet18-test", hidden_dim=d, nheads=8,
                      dim_feedforward=4 * d, enc_layers=1, dec_layers=1,
                      num_queries=100, compute_dtype="float32",
                      contrastive_align_loss=True, contrastive_hdim=64,
                      masks=True, text_hidden=24, text_layers=1, text_heads=4,
                      text_intermediate=96)
    model = build_model(cfg, text_vocab_size=50265)
    b = __graft_entry__._example_batch(B=1, H=64, W=64)
    args = tuple(jnp.asarray(b[k]) for k in
                 ("images", "image_mask", "text_ids", "text_mask"))
    shapes = jax.eval_shape(
        lambda r, *a: model.init(r, *a, method=model.init_forward),
        jax.random.PRNGKey(0), *args)

    sd = _synth_reference_state_dict(stage_sizes=(1, 1, 1, 1), enc=1, dec=1,
                                     d=d, text_layers=1, text_hidden=24)
    # DDP prefix stripping exercised too.
    sd = {f"module.{k}": v for k, v in sd.items()}
    params, frozen = convert_torch_state_dict(
        sd, d_model=d, enc_layers=1, dec_layers=1,
        stage_sizes=(1, 1, 1, 1), with_masks=True)
    converted = {"params": params, **frozen}

    want = {jax.tree_util.keystr(p): v.shape for p, v in
            jax.tree_util.tree_leaves_with_path(shapes)}
    got = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in
           jax.tree_util.tree_leaves_with_path(converted)}
    missing = set(want) - set(got)
    extra = set(got) - set(want)
    assert not missing, f"missing {sorted(missing)[:8]}"
    assert not extra, f"extra {sorted(extra)[:8]}"
    mismatched = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not mismatched, dict(list(mismatched.items())[:5])
