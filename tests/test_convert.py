"""Checkpoint converter tests: numeric parity against real torch modules and
full-tree coverage for the flagship layout."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn

from toist_tpu.models.layers import MultiheadAttention
from toist_tpu.utils.convert import (_mha, _lin, _conv, convert_torch_state_dict,
                                     synth_reference_state_dict as _synth_reference_state_dict)


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
