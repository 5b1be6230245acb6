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
                      resizer_dropout=0.0, contrastive_align_loss=False),
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
    # 240 steps: with the resizer dropout now really off in dropout-free
    # configs the trajectory shifted; 160 left sample 0's box mid-flight.
    for i in range(239):
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


def test_bf16_moment_dtype():
    """optim.moment_dtype="bfloat16" stores AdamW's first moment in bf16
    (second moment stays f32) and the step still optimizes."""
    cfg = dataclasses.replace(
        CFG, optim=dataclasses.replace(CFG.optim, moment_dtype="bfloat16"))
    model = build_model(cfg.model, text_vocab_size=600, tiny_text=True,
                        backbone_norm="group_norm")
    batch = synthetic_batch(B=2)
    wd = build_weight_dict(cfg.loss, masks=False, num_dec_layers=2)
    optimizer = make_optimizer(cfg.optim, 10, 100)
    state, frozen = init_train_state(model, cfg, optimizer, batch, seed=0)
    dtypes = [str(l.dtype) for l in jax.tree_util.tree_leaves(state.opt_state)
              if hasattr(l, "dtype") and l.ndim > 0]
    assert "bfloat16" in dtypes and "float32" in dtypes
    step = make_train_step(model, cfg, wd, optimizer, frozen)
    rng = jax.random.PRNGKey(0)
    state, sc0 = step(state, batch, rng)
    first = float(sc0["loss"])
    for _ in range(7):
        state, sc = step(state, batch, rng)
    assert bool(sc["loss_is_finite"])
    assert float(sc["loss"]) < first
    # Moments keep their dtype through the update.
    dtypes2 = {str(l.dtype) for l in jax.tree_util.tree_leaves(state.opt_state)
               if hasattr(l, "dtype") and l.ndim > 0}
    assert "bfloat16" in dtypes2


def test_grad_accum_matches_full_batch():
    """optim.grad_accum_steps=2 over a 4-sample batch produces the same
    post-step parameters as one step over the full batch: the per-microbatch
    num_boxes_override (global/accum) + gradient averaging reproduce the
    reference's DDP semantics exactly (mdetr.py:996-1001, engine.py:88).
    dropout=0 in CFG so the per-microbatch dropout keys are irrelevant."""
    model = build_model(CFG.model, text_vocab_size=600, tiny_text=True,
                        backbone_norm="group_norm")
    batch = synthetic_batch(B=4)
    wd = build_weight_dict(CFG.loss, masks=False,
                           num_dec_layers=CFG.model.dec_layers)
    optimizer = make_optimizer(CFG.optim, steps_per_epoch=10,
                               total_steps=1000)
    state, frozen = init_train_state(model, CFG, optimizer, batch, seed=0)
    snap = jax.device_get(state)   # the step donates its input state
    rng = jax.random.PRNGKey(0)

    full_step = make_train_step(model, CFG, wd, optimizer, frozen)
    s_full, sc_full = full_step(state, batch, rng)
    p_full = jax.device_get(s_full.params)

    cfg2 = dataclasses.replace(
        CFG, optim=dataclasses.replace(CFG.optim, train_batch_size=2,
                                       grad_accum_steps=2))
    state2 = jax.tree_util.tree_map(jnp.asarray, snap)
    accum_step = make_train_step(model, cfg2, wd, optimizer, frozen)
    s_acc, sc_acc = accum_step(state2, batch, rng)
    p_acc = jax.device_get(s_acc.params)

    np.testing.assert_allclose(float(sc_acc["loss"]), float(sc_full["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(sc_acc["grad_norm"]),
                               float(sc_full["grad_norm"]), rtol=1e-4)
    flat_f = jax.tree_util.tree_leaves_with_path(p_full)
    flat_a = dict(jax.tree_util.tree_leaves_with_path(p_acc))
    # First-step AdamW is ~sign(g)*lr (v = g^2), so elements whose gradient
    # is ~0 legitimately flip update sign under f32 reduction-order noise.
    # Assert the overwhelming majority of parameters took the identical
    # update (loss and grad_norm above pin the aggregate math).
    diffs = np.concatenate(
        [np.abs(flat_a[path] - leaf).ravel() for path, leaf in flat_f])
    frac_bad = float((diffs > 8e-5).mean())
    assert frac_bad < 1e-3, frac_bad


def test_stop_frozen_gradients_symbolic_zeros():
    """Frozen-labeled leaves (stem+layer1 always; text encoder when frozen)
    must contribute SYMBOLIC zero gradients, so clip_by_global_norm sees
    exactly torch's trainable-only norm (requires_grad=False semantics,
    reference backbone.py:68-73, main.py:146-153) and XLA can dead-code
    the frozen backward."""
    import optax

    from toist_tpu.train.optim import stop_frozen_gradients

    params = {
        "backbone": {"conv1": {"kernel": jnp.ones((2, 2))},
                     "layer1_0": {"conv": {"kernel": jnp.ones((3, 3))}},
                     "layer3_0": {"conv": {"kernel": jnp.ones((3, 3))}}},
        "text_encoder": {"emb": {"kernel": jnp.ones((4, 4))}},
        "decoder": {"lin": {"kernel": jnp.ones((5, 5))}},
    }

    def loss(p, freeze_text):
        p = stop_frozen_gradients(p, freeze_text_encoder=freeze_text)
        return sum((leaf ** 2).sum() for leaf in jax.tree_util.tree_leaves(p))

    g = jax.grad(lambda p: loss(p, False))(params)
    assert float(jnp.abs(g["backbone"]["conv1"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(g["backbone"]["layer1_0"]["conv"]["kernel"]).max()) \
        == 0.0
    assert float(jnp.abs(g["backbone"]["layer3_0"]["conv"]["kernel"]).min()) \
        == 2.0
    assert float(jnp.abs(g["text_encoder"]["emb"]["kernel"]).min()) == 2.0

    gf = jax.grad(lambda p: loss(p, True))(params)
    assert float(jnp.abs(gf["text_encoder"]["emb"]["kernel"]).max()) == 0.0
    # The trainable-only global norm is what the reference's
    # clip_grad_norm_ computes: frozen leaves are excluded exactly.
    expected = float(jnp.sqrt(
        (g["backbone"]["layer3_0"]["conv"]["kernel"] ** 2).sum()
        + (g["text_encoder"]["emb"]["kernel"] ** 2).sum()
        + (g["decoder"]["lin"]["kernel"] ** 2).sum()))
    np.testing.assert_allclose(float(optax.global_norm(g)), expected,
                               rtol=1e-6)


def test_frozen_detector_backward_is_dce(seg_cfg=None):
    """frozen_detector (seg training): the jitted step's HLO must not
    contain the trunk backward — proxy: grads for every frozen leaf are
    symbolic zeros, so the grad HLO for the conv backbone is dead. Checked
    via the optimized jaxpr: no conv op may appear after the loss cotangent
    seeds (cheap structural proxy: transpose-of-conv op count drops)."""
    from toist_tpu.train.optim import label_params, stop_frozen_gradients

    # Tiny stand-in "model": frozen trunk conv + trainable head matmul.
    params = {"backbone": {"layer1_0": {"conv": {"kernel": jnp.ones((4, 4))}}},
              "mask_head": {"lin": {"kernel": jnp.ones((4, 4))}}}
    x = jnp.ones((4,))

    def loss(p):
        p = stop_frozen_gradients(p, frozen_detector=True)
        h = x @ p["backbone"]["layer1_0"]["conv"]["kernel"]
        return ((h @ p["mask_head"]["lin"]["kernel"]) ** 2).sum()

    g = jax.grad(loss)(params)
    assert float(jnp.abs(
        g["backbone"]["layer1_0"]["conv"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(g["mask_head"]["lin"]["kernel"]).max()) > 0.0
    # The frozen-trunk cotangent is dead code: the jaxpr for grad(loss) must
    # not compute d/d(trunk kernel) — its only surviving use of the trunk
    # kernel is the forward matmul.
    jaxpr = jax.make_jaxpr(jax.grad(loss))(params)
    uses = sum(str(e.primitive) == "dot_general" for e in jaxpr.eqns)
    # fwd: 2 matmuls; bwd head: 1 (h^T @ dy); bwd into h: 1 (dy @ W^T) is
    # NOT needed once the trunk grad is dead -> exactly 4 would mean the
    # trunk backward survived; expect 3.
    assert uses == 3, jaxpr


def test_engine_nan_hard_stop():
    """Non-finite loss kills training with exit code 1 (reference
    engine.py:82-85 sys.exit on the NaN guard)."""
    from toist_tpu.train import engine

    class FakeState:
        step = 0

    class FakeIter:
        def __len__(self):
            return 1

        def epoch(self, e):
            yield {"images": np.zeros((1,))}

    def nan_step(state, batch, rng):
        return FakeState(), {"loss": np.float32(np.nan),
                             "loss_is_finite": np.float32(0.0)}

    with pytest.raises(SystemExit) as ex:
        engine.train_one_epoch(nan_step, FakeState(), FakeIter(), epoch=0,
                               rng=None, print_freq=1)
    assert ex.value.code == 1
