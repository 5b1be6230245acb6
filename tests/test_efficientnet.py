"""EfficientNet backbone (the native TimmBackbone variant).

Reference behavior: /root/reference/models/backbone.py:117-162 — timm model
with features_only out_indices (1,2,3,4) and BN rewritten to FrozenBN. No timm
oracle exists in this image, so verification is structural: the published
per-variant feature channel counts (timm feature_info.channels()), the four
reduction levels, frozen-BN buffer placement, canvas invariance under the pad
mask, and a full TOIST forward through the backbone swap.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from toist_tpu.models.efficientnet import (_round_filters, _VARIANTS,
                                           make_efficientnet,
                                           parse_timm_efficientnet)
from toist_tpu.models.resnet import make_resnet


def test_variant_channel_counts_match_timm():
    """_round_filters must reproduce timm's published feature channels."""
    # (variant, channels at out_indices (1,2,3,4)) from timm feature_info.
    expected = {"b0": (24, 40, 112, 320), "b3": (32, 48, 136, 384),
                "b5": (40, 64, 176, 512)}
    for variant, chans in expected.items():
        w, _ = _VARIANTS[variant]
        got = tuple(_round_filters(c, w) for c in (24, 40, 112, 320))
        assert got == chans, (variant, got, chans)


def test_parse_timm_names():
    assert parse_timm_efficientnet("timm_tf_efficientnet_b3_ns") == "b3"
    assert parse_timm_efficientnet("timm_efficientnet_b0") == "b0"
    assert parse_timm_efficientnet("timm_resnest101e") is None


def test_feature_pyramid_shapes():
    model = make_efficientnet("b0", "frozen_bn", jnp.float32)
    x = jnp.zeros((2, 64, 64, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    feats = jax.jit(model.apply)(variables, x)
    assert set(feats) == {"layer1", "layer2", "layer3", "layer4"}
    assert feats["layer1"].shape == (2, 16, 16, 24)   # reduction 4
    assert feats["layer2"].shape == (2, 8, 8, 40)     # reduction 8
    assert feats["layer3"].shape == (2, 4, 4, 112)    # reduction 16
    assert feats["layer4"].shape == (2, 2, 2, 320)    # reduction 32
    # FrozenBN statistics live in the non-trainable 'frozen' collection
    # (replace_bn analogue): present, and absent under group_norm.
    assert "frozen" in variables
    gn = make_efficientnet("b0", "group_norm", jnp.float32)
    gn_vars = jax.jit(gn.init)(jax.random.PRNGKey(0), x)
    assert "frozen" not in gn_vars


def test_canvas_invariance_under_padding():
    """Zero-padding the canvas must not change features of the valid region
    (the SE global pool is the leak risk; it pools valid pixels only)."""
    model = make_efficientnet("b0", "frozen_bn", jnp.float32)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)

    mask_small = jnp.zeros((1, 64, 64), bool)
    f_small = jax.jit(model.apply)(variables, img, mask_small)

    canvas = jnp.zeros((1, 96, 96, 3)).at[:, :64, :64, :].set(img)
    mask_big = jnp.ones((1, 96, 96), bool).at[:, :64, :64].set(False)
    f_big = jax.jit(model.apply)(variables, canvas, mask_big)

    for name, red in (("layer1", 4), ("layer2", 8), ("layer3", 16),
                      ("layer4", 32)):
        a = np.asarray(f_small[name])
        b = np.asarray(f_big[name])[:, :64 // red, :64 // red, :]
        np.testing.assert_allclose(b, a, atol=1e-5, err_msg=name)


def test_make_resnet_dispatch():
    m = make_resnet("timm_tf_efficientnet_b0", "frozen_bn", False,
                    jnp.float32)
    assert m.width_mult == 1.0
    with pytest.raises(ValueError, match="not available"):
        make_resnet("timm_resnest101e", "frozen_bn", False, jnp.float32)


def test_toist_forward_with_efficientnet_backbone():
    """Full TOIST forward with the backbone swapped to EfficientNet-B0 (the
    reference's --backbone timm_<name> path end to end)."""
    import dataclasses

    import __graft_entry__
    from toist_tpu.config import ModelConfig
    from toist_tpu.models.toist import build_model
    from toist_tpu.train.step import init_variables

    cfg = ModelConfig(backbone="timm_efficientnet_b0", hidden_dim=64,
                      nheads=4, dim_feedforward=128, enc_layers=2,
                      dec_layers=2, num_queries=12, compute_dtype="float32",
                      contrastive_align_loss=False)
    model = build_model(cfg, text_vocab_size=600, tiny_text=True)
    batch = __graft_entry__._example_batch(B=2, H=64, W=64, T=16, N=4,
                                           n_text_ids=500)
    variables = init_variables(model, batch, seed=0)
    out, cache = jax.jit(lambda v, *a: model.apply(v, *a))(
        variables, jnp.asarray(batch["images"]),
        jnp.asarray(batch["image_mask"]), jnp.asarray(batch["text_ids"]),
        jnp.asarray(batch["text_mask"]))
    assert out["pred_logits"].shape == (2, 12, 256)
    assert out["pred_boxes"].shape == (2, 12, 4)
    assert np.isfinite(np.asarray(out["pred_logits"])).all()


def test_timm_checkpoint_ingestion_numeric_parity():
    """convert_timm_efficientnet: a timm-layout state_dict loaded through the
    converter must make our EfficientNet reproduce a hand-written torch
    forward that consumes the SAME timm-layout dict directly (BN eval-mode,
    silu, SE over global mean, symmetric k//2 padding — the published
    efficientnet_b0 architecture). This pins the OIHW->HWIO transposes, the
    DS-block conv_pw->conv_pwl rename, and FrozenBN buffer placement with an
    oracle independent of our own naming."""
    import torch
    import torch.nn.functional as F

    from toist_tpu.models.efficientnet import _B0_STAGES, _round_filters
    from toist_tpu.utils.pretrained import (_check_same_shapes,
                                            convert_timm_efficientnet)

    g = torch.Generator().manual_seed(0)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.1

    def bn_entries(prefix, ch, sd):
        sd[f"{prefix}.weight"] = t(ch) + 1.0
        sd[f"{prefix}.bias"] = t(ch)
        sd[f"{prefix}.running_mean"] = t(ch)
        sd[f"{prefix}.running_var"] = t(ch).abs() + 0.5

    # Build a timm-layout efficientnet_b0 state_dict (random values).
    sd = {}
    stem = _round_filters(32, 1.0)
    sd["conv_stem.weight"] = t(stem, 3, 3, 3)
    bn_entries("bn1", stem, sd)
    cin = stem
    for s, (exp, k, _stride, ch, reps) in enumerate(_B0_STAGES):
        cout = _round_filters(ch, 1.0)
        for b in range(reps):  # depth_mult 1.0 for b0
            p = f"blocks.{s}.{b}"
            mid = cin * exp
            if exp != 1:
                sd[f"{p}.conv_pw.weight"] = t(mid, cin, 1, 1)
                bn_entries(f"{p}.bn1", mid, sd)
            sd[f"{p}.conv_dw.weight"] = t(mid, 1, k, k)
            bn_entries(f"{p}.bn2" if exp != 1 else f"{p}.bn1", mid, sd)
            se = max(1, cin // 4)
            sd[f"{p}.se.conv_reduce.weight"] = t(se, mid, 1, 1)
            sd[f"{p}.se.conv_reduce.bias"] = t(se)
            sd[f"{p}.se.conv_expand.weight"] = t(mid, se, 1, 1)
            sd[f"{p}.se.conv_expand.bias"] = t(mid)
            proj = "conv_pwl" if exp != 1 else "conv_pw"
            sd[f"{p}.{proj}.weight"] = t(cout, mid, 1, 1)
            bn_entries(f"{p}.bn3" if exp != 1 else f"{p}.bn2", cout, sd)
            cin = cout
    # Head entries that features_only discards must be ignored.
    sd["conv_head.weight"] = t(1280, cin, 1, 1)
    sd["classifier.weight"] = t(1000, 1280)
    sd["classifier.bias"] = t(1000)

    sd_np = {k: v.numpy() for k, v in sd.items()}
    bp, bf = convert_timm_efficientnet(sd_np)

    model = make_efficientnet("b0", "frozen_bn", jnp.float32)
    img = np.asarray(np.random.default_rng(1).normal(size=(1, 32, 32, 3)),
                     np.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(img))
    _check_same_shapes(variables["params"], bp, "params")
    _check_same_shapes(variables["frozen"], bf, "frozen")
    feats = jax.jit(model.apply)({"params": bp, "frozen": bf},
                                 jnp.asarray(img))

    # Hand-written torch forward consuming the timm layout directly.
    def bn_t(x, prefix):
        w, b = sd[f"{prefix}.weight"], sd[f"{prefix}.bias"]
        m, v = sd[f"{prefix}.running_mean"], sd[f"{prefix}.running_var"]
        return F.batch_norm(x, m, v, w, b, training=False, eps=1e-5)

    x = torch.from_numpy(img).permute(0, 3, 1, 2)
    with torch.no_grad():
        x = F.conv2d(x, sd["conv_stem.weight"], stride=2, padding=1)
        x = F.silu(bn_t(x, "bn1"))
        taps, cin = {}, stem
        for s, (exp, k, stride, ch, reps) in enumerate(_B0_STAGES):
            cout = _round_filters(ch, 1.0)
            for b in range(reps):
                p = f"blocks.{s}.{b}"
                st = stride if b == 0 else 1
                mid = cin * exp
                h = x
                if exp != 1:
                    h = F.silu(bn_t(F.conv2d(h, sd[f"{p}.conv_pw.weight"]),
                                    f"{p}.bn1"))
                h = F.conv2d(h, sd[f"{p}.conv_dw.weight"], stride=st,
                             padding=k // 2, groups=mid)
                h = F.silu(bn_t(h, f"{p}.bn2" if exp != 1 else f"{p}.bn1"))
                se = F.silu(F.conv2d(h.mean((2, 3), keepdim=True),
                                     sd[f"{p}.se.conv_reduce.weight"],
                                     sd[f"{p}.se.conv_reduce.bias"]))
                se = F.conv2d(se, sd[f"{p}.se.conv_expand.weight"],
                              sd[f"{p}.se.conv_expand.bias"])
                h = h * torch.sigmoid(se)
                proj = "conv_pwl" if exp != 1 else "conv_pw"
                h = bn_t(F.conv2d(h, sd[f"{p}.{proj}.weight"]),
                         f"{p}.bn3" if exp != 1 else f"{p}.bn2")
                x = h + x if (st == 1 and cin == cout) else h
                cin = cout
            taps[s + 1] = x
    for stage, name in ((2, "layer1"), (3, "layer2"), (5, "layer3"),
                        (7, "layer4")):
        ref = taps[stage].permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(feats[name]), ref, atol=2e-4,
                                   err_msg=name)
