"""End-to-end train step test: the tiny model overfits a synthetic batch."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from toist_tpu.config import Config, ModelConfig, OptimConfig, LossConfig
from toist_tpu.models.toist import build_model
from toist_tpu.train.criterion import build_weight_dict
from toist_tpu.train.optim import make_optimizer
from toist_tpu.train.step import (init_train_state, make_eval_step,
                                  make_train_step)

# dropout=0: the overfit trajectory should test optimization, not a
# particular dropout realization (with dropout on, the 160-step box error
# depends on the PRNG stream and flaps around the assertion threshold).
CFG = Config(
    model=ModelConfig(backbone="resnet18-test", hidden_dim=64, nheads=4,
                      dim_feedforward=128, enc_layers=2, dec_layers=2,
                      num_queries=12, compute_dtype="float32", dropout=0.0,
                      contrastive_align_loss=False),
    optim=OptimConfig(lr=2e-3, lr_backbone=2e-3, text_encoder_lr=2e-3,
                      epochs=100, lr_drop=1000, ema=True, ema_decay=0.9,
                      schedule="step", clip_max_norm=0.5),
    loss=LossConfig(aux_loss=True),
)


def synthetic_batch(B=2, H=64, W=64, N=4, T=12, L=256):
    """Images with one bright square each; box targets on the square."""
    rng = np.random.default_rng(0)
    images = rng.normal(0, 0.05, (B, H, W, 3)).astype(np.float32)
    boxes = np.zeros((B, N, 4), np.float32)
    bv = np.zeros((B, N), bool)
    pm = np.zeros((B, N, L), np.float32)
    for b in range(B):
        x0, y0, s = 8 + 20 * b, 12, 20
        images[b, y0:y0 + s, x0:x0 + s] = 2.0
        boxes[b, 0] = [(x0 + s / 2) / W, (y0 + s / 2) / H, s / W, s / H]
        bv[b, 0] = True
        pm[b, 0, 1:4] = 1 / 3
    text_ids = np.full((B, T), 1, np.int32)
    text_ids[:, :5] = np.arange(5) + 4
    text_mask = np.ones((B, T), bool)
    text_mask[:, :5] = False
    return {
        "images": jnp.asarray(images),
        "image_mask": jnp.zeros((B, H, W), bool),
        "text_ids": jnp.asarray(text_ids),
        "text_mask": jnp.asarray(text_mask),
        "boxes": jnp.asarray(boxes),
        "labels": jnp.zeros((B, N), jnp.int64),
        "box_valid": jnp.asarray(bv),
        "positive_map": jnp.asarray(pm),
        "caption_noun_span": jnp.full((B, 2), 4, jnp.int32),
        "sample_valid": jnp.ones((B,), bool),
        "orig_size": jnp.asarray([[H, W]] * B, jnp.int32),
    }


@pytest.mark.slow
def test_overfit_single_batch():
    model = build_model(CFG.model, text_vocab_size=600, tiny_text=True,
                        backbone_norm="group_norm")
    batch = synthetic_batch()
    wd = build_weight_dict(CFG.loss, masks=False,
                           num_dec_layers=CFG.model.dec_layers)
    optimizer = make_optimizer(CFG.optim, steps_per_epoch=10,
                               total_steps=1000)
    state, frozen = init_train_state(model, CFG, optimizer, batch, seed=0)

    train_step = make_train_step(model, CFG, wd, optimizer, frozen)
    rng = jax.random.PRNGKey(0)
    state, scalars = train_step(state, batch, rng)
    first_loss = float(scalars["loss"])
    assert bool(scalars["loss_is_finite"])
    # Avoid per-step host syncs (expensive here); fetch only the last scalars.
    for i in range(159):
        state, scalars = train_step(state, batch, rng)
    last_loss = float(scalars["loss"])
    assert bool(scalars["loss_is_finite"])
    assert last_loss < 0.5 * first_loss, (first_loss, last_loss)

    # Eval step: top-scoring box should be near the target.
    eval_step = make_eval_step(model, CFG, wd, frozen)
    res = eval_step(state.params, batch)
    post = {k: np.asarray(v) for k, v in res["post"].items()}
    b = 0
    best = post["scores"][b].argmax()
    bx = post["boxes"][b, best]  # xyxy absolute
    tgt = np.array([8, 12, 28, 32], np.float32)
    assert np.abs(bx - tgt).max() < 10, (bx, tgt)

    # EMA params track the raw params.
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params,
        state.ema_params)
    max_diff = max(jax.tree_util.tree_leaves(diff))
    assert 0 < max_diff < 1.0
