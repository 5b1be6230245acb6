"""Smoke + contract tests for the TOIST model forward (tiny config, CPU)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from toist_tpu.config import ModelConfig
from toist_tpu.models.position_encoding import sine_position_embedding
from toist_tpu.models.postprocess import postprocess_boxes
from toist_tpu.models.toist import build_model

TINY = ModelConfig(backbone="resnet18-test", hidden_dim=64, nheads=4,
                   dim_feedforward=128, enc_layers=2, dec_layers=2,
                   num_queries=20, compute_dtype="float32",
                   contrastive_align_loss=True, contrastive_hdim=16)


@pytest.fixture(scope="module")
def model_and_params():
    model = build_model(TINY, text_vocab_size=600, tiny_text=True,
                        backbone_norm="group_norm")
    B, H, W, T = 2, 64, 96, 16
    images = jnp.zeros((B, H, W, 3))
    image_mask = jnp.zeros((B, H, W), bool).at[:, :, 80:].set(True)
    text_ids = jnp.full((B, T), 1, jnp.int32).at[:, :6].set(
        jnp.arange(6) + 4)
    text_mask = jnp.ones((B, T), bool).at[:, :6].set(False)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, image_mask,
                                 text_ids, text_mask)
    # Jitted entry points: eager flax apply dispatches op-by-op and is ~50x
    # slower in this environment (see .claude/skills/verify/SKILL.md).
    encode = jax.jit(lambda p, *a: model.apply(p, *a, method=model.encode))
    decode = jax.jit(lambda p, c, **kw: model.apply(p, c, method=model.decode, **kw),
                     static_argnames=("use_modified_memory",))
    fwd = jax.jit(lambda p, *a: model.apply(p, *a))
    fns = {"encode": encode, "decode": decode, "fwd": fwd}
    return model, params, (images, image_mask, text_ids, text_mask), fns


def test_two_phase_contract(model_and_params):
    model, params, batch, fns = model_and_params
    images, image_mask, text_ids, text_mask = batch
    cache = fns["encode"](params, images, image_mask, text_ids, text_mask)
    B, T = text_ids.shape
    fh, fw = cache["feature_hw"]
    assert fh == 64 // 32 and fw == 96 // 32
    S = fh * fw + T
    assert cache["img_memory"].shape == (B, S, 64)
    assert cache["text_memory"].shape == (B, T, 64)
    assert cache["pos_embed"].shape == (B, S, 64)
    # Text positions get zero pos embedding (transformer.py:148)
    np.testing.assert_allclose(np.asarray(cache["pos_embed"][:, -T:]), 0.0)

    out = fns["decode"](params, cache)
    assert out["pred_logits"].shape == (B, 20, 256)
    assert out["pred_boxes"].shape == (B, 20, 4)
    assert out["aux_pred_logits"].shape == (1, B, 20, 256)
    assert (np.asarray(out["pred_boxes"]) >= 0).all()
    assert (np.asarray(out["pred_boxes"]) <= 1).all()
    assert out["proj_queries"].shape == (B, 20, 16)
    assert out["proj_tokens"].shape == (B, T, 16)
    # Projections are L2-normalized.
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["proj_queries"]), axis=-1), 1.0,
        atol=1e-5)


def test_memory_modification_seam(model_and_params):
    """img_memory_mod is honored by decode (the cluster-distillation seam)."""
    model, params, batch, fns = model_and_params
    cache = fns["encode"](params, *batch)
    out1 = fns["decode"](params, cache)
    cache2 = dict(cache)
    cache2["img_memory_mod"] = cache["img_memory"] + 0.3
    out2 = fns["decode"](params, cache2, use_modified_memory=True)
    assert np.abs(np.asarray(out1["pred_logits"]) -
                  np.asarray(out2["pred_logits"])).max() > 1e-6
    # Without the flag, mod memory is ignored.
    out3 = fns["decode"](params, cache2)
    np.testing.assert_allclose(np.asarray(out1["pred_logits"]),
                               np.asarray(out3["pred_logits"]), atol=1e-6)


def test_canvas_padding_invariance():
    """Zero-padding the canvas larger must not change predictions.

    This is the invariance bucketed batching relies on (batcher pads to a fixed
    canvas instead of the reference's per-batch max): with FrozenBN (per-channel
    affine) valid-pixel conv features are unchanged by extra zero padding, the
    sine pos embedding normalizes over the valid region only, and padded tokens
    are excluded from attention. (GroupNorm backbones lose exactness because
    norm statistics include padding — true of the reference's GroupNorm
    variant too.)
    """
    cfg = dataclasses.replace(TINY, contrastive_align_loss=False)
    model = build_model(cfg, text_vocab_size=600, tiny_text=True,
                        backbone_norm="frozen_bn")
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    text_ids = jnp.full((1, 8), 1, jnp.int32).at[:, :5].set(jnp.arange(5) + 4)
    text_mask = jnp.ones((1, 8), bool).at[:, :5].set(False)

    mask_small = jnp.zeros((1, 64, 64), bool)
    params = jax.jit(model.init)(jax.random.PRNGKey(1), img, mask_small,
                                 text_ids, text_mask)
    fwd = jax.jit(lambda p, *a: model.apply(p, *a))
    out_small, _ = fwd(params, img, mask_small, text_ids, text_mask)

    big = jnp.zeros((1, 64, 96, 3)).at[:, :, :64].set(img)
    mask_big = jnp.ones((1, 64, 96), bool).at[:, :, :64].set(False)
    out_big, _ = fwd(params, big, mask_big, text_ids, text_mask)
    np.testing.assert_allclose(np.asarray(out_small["pred_logits"]),
                               np.asarray(out_big["pred_logits"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_small["pred_boxes"]),
                               np.asarray(out_big["pred_boxes"]), atol=2e-4)


def test_sine_position_embedding_values():
    # Unpadded 2x2 grid, 2 feats per axis: check normalization to 2*pi.
    mask = jnp.zeros((1, 2, 2), bool)
    pos = sine_position_embedding(mask, num_pos_feats=2)
    assert pos.shape == (1, 2, 2, 4)
    # y axis: cumsum -> [1, 2]; normalized: [pi, 2pi]. sin(pi)~0, sin(2pi)~0
    np.testing.assert_allclose(np.asarray(pos[0, :, 0, 0]), [0.0, 0.0],
                               atol=1e-5)


def test_postprocess():
    logits = jnp.zeros((1, 3, 256)).at[0, 0, -1].set(10.0)
    boxes = jnp.asarray([[[0.5, 0.5, 0.2, 0.2],
                          [0.25, 0.25, 0.1, 0.1],
                          [0.5, 0.5, 1.0, 1.0]]])
    res = postprocess_boxes(logits, boxes, jnp.asarray([[100, 200]]))
    r = {k: np.asarray(v) for k, v in res.items()}
    assert r["scores"][0, 0] < 0.02  # no-object wins (score ~ 255*e^-10)
    np.testing.assert_allclose(r["scores"][0, 1], 1 - 1 / 256, atol=1e-3)
    np.testing.assert_allclose(r["boxes"][0, 1], [40, 20, 60, 30], atol=1e-4)
    assert (r["labels"] == 1).all()


def test_cls_contrastive_loss_path():
    """--contrastive_loss variant: CLS prepended to the image sequence, pooled
    text/image ops in the cache (reference transformer.py:55,107-119,159-160)."""
    cfg = dataclasses.replace(TINY, contrastive_loss=True)
    model = build_model(cfg, text_vocab_size=600, tiny_text=True,
                        backbone_norm="group_norm")
    B, H, W, T = 2, 64, 96, 12
    images = jnp.zeros((B, H, W, 3))
    image_mask = jnp.zeros((B, H, W), bool)
    text_ids = jnp.full((B, T), 1, jnp.int32).at[:, :5].set(jnp.arange(5) + 4)
    text_mask = jnp.ones((B, T), bool).at[:, :5].set(False)
    params = jax.jit(lambda r: model.init(r, images, image_mask, text_ids,
                                          text_mask))(jax.random.PRNGKey(0))
    assert "CLS" in params["params"]
    assert "pooler" in params["params"]["text_encoder"]
    cache = jax.jit(lambda p, *a: model.apply(p, *a, method=model.encode))(
        params, images, image_mask, text_ids, text_mask)
    fh, fw = cache["feature_hw"]
    assert cache["img_memory"].shape == (B, 1 + fh * fw + T, 64)
    np.testing.assert_allclose(np.asarray(cache["img_pooled_op"]),
                               np.asarray(cache["img_memory"][:, 0]))
    assert cache["text_pooled_op"].shape == (B, 64)
    out = jax.jit(lambda p, c: model.apply(p, c, method=model.decode))(
        params, cache)
    assert out["pred_logits"].shape == (B, cfg.num_queries, cfg.num_classes + 1)
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()


def test_learned_position_embedding_path():
    """--position_embedding learned variant builds and runs end to end."""
    cfg = dataclasses.replace(TINY, position_embedding="learned")
    model = build_model(cfg, text_vocab_size=600, tiny_text=True,
                        backbone_norm="group_norm")
    B, H, W, T = 1, 64, 64, 10
    images = jnp.zeros((B, H, W, 3))
    image_mask = jnp.zeros((B, H, W), bool)
    text_ids = jnp.full((B, T), 1, jnp.int32).at[:, :4].set(jnp.arange(4) + 4)
    text_mask = jnp.ones((B, T), bool).at[:, :4].set(False)
    params = jax.jit(lambda r: model.init(r, images, image_mask, text_ids,
                                          text_mask))(jax.random.PRNGKey(0))
    assert "learned_pos" in params["params"]
    assert params["params"]["learned_pos"]["row_embed"].shape == (50, 32)
    (out, _cache) = jax.jit(lambda p, *a: model.apply(p, *a))(
        params, images, image_mask, text_ids, text_mask)
    assert np.isfinite(np.asarray(out["pred_logits"])).all()


def test_uint8_device_normalize_matches_host(model_and_params):
    """u8 canvases + on-device normalize == host-normalized f32 canvases.

    The device path (models/toist.normalize_uint8_images) must reproduce
    data/transforms.to_array_and_normalize exactly, including the zero pad
    region of the host canvas (data/batcher.pad_sample_to_canvas)."""
    model, params, batch, fns = model_and_params
    _, image_mask, text_ids, text_mask = batch
    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 256, image_mask.shape + (3,)).astype(np.uint8)
    from toist_tpu.data.transforms import _NORM_SCALE, _NORM_SHIFT
    f32 = np.empty(u8.shape, np.float32)
    np.multiply(u8, _NORM_SCALE, out=f32)
    np.subtract(f32, _NORM_SHIFT, out=f32)
    f32[np.asarray(image_mask)] = 0.0   # host canvases are zero-padded
    out_u8, _ = fns["fwd"](params, jnp.asarray(u8), image_mask, text_ids,
                           text_mask)
    out_f32, _ = fns["fwd"](params, jnp.asarray(f32), image_mask, text_ids,
                            text_mask)
    np.testing.assert_allclose(np.asarray(out_u8["pred_logits"]),
                               np.asarray(out_f32["pred_logits"]),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_u8["pred_boxes"]),
                               np.asarray(out_f32["pred_boxes"]),
                               rtol=0, atol=2e-6)


def test_stem_conv_space_to_depth_exact():
    """StemConv's space-to-depth rewrite must equal the plain 7x7/s2/p3 conv."""
    import jax
    import jax.numpy as jnp

    from toist_tpu.models.resnet import StemConv

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(2, 64, 96, 3)), jnp.float32)
    stem = StemConv(8, dtype=jnp.float32)
    variables = jax.jit(stem.init)(jax.random.PRNGKey(0), x)
    got = jax.jit(stem.apply)(variables, x)
    want = jax.lax.conv_general_dilated(
        x, variables["params"]["kernel"], (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert got.shape == want.shape == (2, 32, 48, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    # Odd spatial sizes fall back to the plain conv path.
    x_odd = jnp.asarray(rng.normal(size=(1, 63, 95, 3)), jnp.float32)
    got_odd = jax.jit(stem.apply)(variables, x_odd)
    want_odd = jax.lax.conv_general_dilated(
        x_odd, variables["params"]["kernel"], (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got_odd), np.asarray(want_odd),
                               atol=1e-5, rtol=1e-5)
