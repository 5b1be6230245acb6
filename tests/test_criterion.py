"""Unit tests for the fixed-shape set criterion and optimizer utilities."""
import jax
import jax.numpy as jnp
import numpy as np

from toist_tpu.config import LossConfig
from toist_tpu.train import criterion as crit
from toist_tpu.train.optim import label_params, make_schedules
from toist_tpu.config import OptimConfig


def _batch(B=2, N=4, L=16, T=8):
    rng = np.random.default_rng(0)
    boxes = np.zeros((B, N, 4), np.float32)
    boxes[:, :, :] = rng.uniform(0.3, 0.6, (B, N, 4))
    pm = np.zeros((B, N, L), np.float32)
    pm[:, :, 1:3] = 0.5
    bv = np.zeros((B, N), bool)
    bv[0, :2] = True
    bv[1, :1] = True
    return {
        "boxes": jnp.asarray(boxes),
        "positive_map": jnp.asarray(pm),
        "box_valid": jnp.asarray(bv),
        "sample_valid": jnp.asarray([True, True]),
        "text_mask": jnp.ones((B, T), bool).at[:, :5].set(False),
    }


def test_loss_labels_hand_value():
    # 1 sample, 2 queries, 3 cols. Target 0 matched to query 1.
    logits = jnp.zeros((1, 2, 3))
    pm = jnp.asarray([[[1.0, 0.0, 0.0]]])           # [B=1, N=1, L=3]
    t2q = jnp.asarray([[1]], jnp.int32)
    bv = jnp.asarray([[True]])
    sv = jnp.asarray([1.0])
    out = jax.jit(lambda *a: crit.loss_labels(*a, eos_coef=0.1,
                                              num_boxes=jnp.float32(1.0)))(
        logits, pm, t2q, bv, sv)
    # log_softmax of zeros = -log(3) everywhere.
    # matched query: CE = log(3); unmatched: CE = log(3) * eos 0.1
    expect = np.log(3) * (1 + 0.1)
    np.testing.assert_allclose(float(out), expect, rtol=1e-4)


def test_loss_boxes_hand_value():
    pred = jnp.asarray([[[0.5, 0.5, 0.2, 0.2], [0.1, 0.1, 0.1, 0.1]]])
    tgt = jnp.asarray([[[0.5, 0.5, 0.2, 0.2], [0.0, 0.0, 0.0, 0.0]]])
    t2q = jnp.asarray([[0, -1]], jnp.int32)
    bv = jnp.asarray([[True, False]])
    l1, lg = jax.jit(crit.loss_boxes)(pred, tgt, t2q, bv, jnp.float32(1.0))
    np.testing.assert_allclose(float(l1), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(lg), 0.0, atol=1e-5)  # giou(identical)=1


def test_padded_targets_do_not_contribute():
    B, Q, N, L = 2, 6, 4, 16
    rng = np.random.default_rng(1)
    batch = _batch(B=B, N=N, L=L)
    out = {
        "pred_logits": jnp.asarray(rng.normal(size=(B, Q, L)), jnp.float32),
        "pred_boxes": jnp.asarray(rng.uniform(0.2, 0.8, (B, Q, 4)), jnp.float32),
    }
    cfg = LossConfig(aux_loss=False)
    scrit = jax.jit(crit.set_criterion, static_argnums=(2,))
    losses = scrit(out, batch, cfg)
    # Same computation with garbage in the padded target slots.
    batch2 = dict(batch)
    batch2["boxes"] = batch["boxes"].at[0, 2:].set(0.9)
    batch2["positive_map"] = batch["positive_map"].at[0, 2:].set(1.0 / L)
    losses2 = scrit(out, batch2, cfg)
    for k in ("loss_ce", "loss_bbox", "loss_giou"):
        np.testing.assert_allclose(float(losses[k]), float(losses2[k]),
                                   rtol=1e-5)


def test_invalid_sample_excluded():
    B, Q, N, L = 2, 6, 4, 16
    rng = np.random.default_rng(2)
    batch = _batch(B=B, N=N, L=L)
    batch["sample_valid"] = jnp.asarray([True, False])
    out = {
        "pred_logits": jnp.asarray(rng.normal(size=(B, Q, L)), jnp.float32),
        "pred_boxes": jnp.asarray(rng.uniform(0.2, 0.8, (B, Q, 4)), jnp.float32),
    }
    cfg = LossConfig(aux_loss=False)
    scrit = jax.jit(crit.set_criterion, static_argnums=(2,))
    losses = scrit(out, batch, cfg)
    # Garbage predictions in the invalid sample must not change anything.
    out2 = dict(out)
    out2["pred_logits"] = out["pred_logits"].at[1].set(7.0)
    out2["pred_boxes"] = out["pred_boxes"].at[1].set(0.01)
    losses2 = scrit(out2, batch, cfg)
    for k in ("loss_ce", "loss_bbox", "loss_giou"):
        np.testing.assert_allclose(float(losses[k]), float(losses2[k]),
                                   rtol=1e-5)


def test_contrastive_align_sign_and_zero():
    B, Q, T, N, h = 1, 4, 6, 2, 8
    rng = np.random.default_rng(3)
    q = rng.normal(size=(B, Q, h)); q /= np.linalg.norm(q, axis=-1, keepdims=True)
    t = rng.normal(size=(B, T, h)); t /= np.linalg.norm(t, axis=-1, keepdims=True)
    pm = np.zeros((B, N, 16), np.float32)
    pm[:, :, 1:3] = 0.5
    jca = jax.jit(lambda *a: crit.loss_contrastive_align(*a[:-2], 0.07, a[-1]))
    loss = jca(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(pm),
        jnp.asarray([[0, 2]], jnp.int32), jnp.asarray([[True, True]]),
        jnp.ones((B, T), bool).at[:, :4].set(False),
        jnp.asarray([True]), 0.07, jnp.float32(2.0))
    assert np.isfinite(float(loss))
    # No valid boxes -> loss 0.
    loss0 = jca(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(pm),
        jnp.asarray([[-1, -1]], jnp.int32), jnp.asarray([[False, False]]),
        jnp.ones((B, T), bool).at[:, :4].set(False),
        jnp.asarray([True]), 0.07, jnp.float32(1.0))
    np.testing.assert_allclose(float(loss0), 0.0, atol=1e-6)


def test_focal_dice_basic():
    B, N, P = 1, 2, 64
    perfect = jnp.full((B, N, P), 20.0)
    tgt = jnp.ones((B, N, P))
    v = jnp.asarray([[1.0, 0.0]])
    f = crit.sigmoid_focal_loss(perfect, tgt, v, jnp.float32(1.0))
    d = crit.dice_loss(perfect, tgt, v, jnp.float32(1.0))
    assert float(f) < 1e-4 and float(d) < 1e-2
    wrong = -perfect
    f2 = crit.sigmoid_focal_loss(wrong, tgt, v, jnp.float32(1.0))
    assert float(f2) > 1.0


def test_weight_dict_and_total():
    cfg = LossConfig(softkd_loss=True, cluster=True)
    wd = crit.build_weight_dict(cfg, masks=True, num_dec_layers=6)
    assert wd["loss_ce"] == 1 and wd["loss_bbox"] == 5 and wd["loss_giou"] == 2
    assert wd["loss_ce_4"] == 1 and "loss_mask_2" in wd
    assert wd["loss_softkd"] == 50.0 and wd["loss_cluster_feature"] == 1e4
    losses = {"loss_ce": jnp.float32(2.0), "noun_loss_bbox": jnp.float32(1.0),
              "cardinality_error": jnp.float32(9.0), "_tgt2query": jnp.zeros(3)}
    tot = crit.total_loss(losses, wd)
    np.testing.assert_allclose(float(tot), 2.0 + 5.0)


def test_label_params_groups():
    params = {
        "backbone": {"conv1": {"kernel": 1}, "layer1_0": {"conv1": {"kernel": 2}},
                     "layer3_5": {"conv2": {"kernel": 3}}},
        "text_encoder": {"layer_0": {"intermediate": {"kernel": 4}}},
        "encoder": {"layer_0": {"ffn": {"linear1": {"kernel": 5}}}},
        "query_embed": 6,
    }
    labels = label_params(params)
    assert labels["backbone"]["conv1"]["kernel"] == "frozen"
    assert labels["backbone"]["layer1_0"]["conv1"]["kernel"] == "frozen"
    assert labels["backbone"]["layer3_5"]["conv2"]["kernel"] == "backbone"
    assert labels["text_encoder"]["layer_0"]["intermediate"]["kernel"] == \
        "text_encoder"
    assert labels["encoder"]["layer_0"]["ffn"]["linear1"]["kernel"] == "model"
    assert labels["query_embed"] == "model"


def test_schedules_reference_semantics():
    cfg = OptimConfig(lr=1e-4, lr_backbone=1e-5, text_encoder_lr=5e-5,
                      epochs=60, lr_drop=7, fraction_warmup_steps=0.01,
                      schedule="linear_with_warmup")
    spe, total = 100, 6000
    s = make_schedules(cfg, spe, total)
    # Model lr: step decay by 10 at epoch 7.
    np.testing.assert_allclose(float(s["model"](jnp.int32(0))), 1e-4)
    np.testing.assert_allclose(float(s["model"](jnp.int32(7 * spe))), 1e-5,
                               rtol=1e-6)
    # Text lr: warmup over 60 steps then linear decay to 0.
    np.testing.assert_allclose(float(s["text_encoder"](jnp.int32(30))),
                               5e-5 * 30 / 60, rtol=1e-6)
    np.testing.assert_allclose(float(s["text_encoder"](jnp.int32(6000))), 0.0,
                               atol=1e-12)
    assert float(s["frozen"](jnp.int32(10))) == 0.0


def test_hungarian_match_levels_equals_per_level():
    """One batched [L*B] solve must agree with L independent per-level solves."""
    from toist_tpu.ops.matching import hungarian_match, hungarian_match_levels
    L, B, Q, N, C = 3, 2, 6, 4, 16
    rng = np.random.default_rng(7)
    logits = jnp.asarray(rng.normal(size=(L, B, Q, C)), jnp.float32)
    pboxes = jnp.asarray(rng.uniform(0.2, 0.8, (L, B, Q, 4)), jnp.float32)
    batch = _batch(B=B, N=N, L=C)
    batched = jax.jit(hungarian_match_levels)(
        logits, pboxes, batch["boxes"], batch["positive_map"],
        batch["box_valid"])
    for lvl in range(L):
        single = hungarian_match(logits[lvl], pboxes[lvl], batch["boxes"],
                                 batch["positive_map"], batch["box_valid"])
        np.testing.assert_array_equal(np.asarray(batched[lvl]),
                                      np.asarray(single.tgt2query))


def test_loss_softkd_levels_equals_per_level():
    from toist_tpu.ops.matching import hungarian_match_levels
    L, B, Q, N, C = 3, 2, 6, 4, 16
    rng = np.random.default_rng(8)
    batch = _batch(B=B, N=N, L=C)
    def stream(seed):
        r = np.random.default_rng(seed)
        lg = jnp.asarray(r.normal(size=(L, B, Q, C)), jnp.float32)
        bx = jnp.asarray(r.uniform(0.2, 0.8, (L, B, Q, 4)), jnp.float32)
        t2q = hungarian_match_levels(lg, bx, batch["boxes"],
                                     batch["positive_map"],
                                     batch["box_valid"])
        return lg, bx, t2q
    nl, nb, tn = stream(1)
    sl, sb, ts = stream(2)
    sv = batch["sample_valid"]
    kd = jax.jit(crit.loss_softkd_levels)(nl, sl, nb, sb, tn, ts,
                                          batch["box_valid"], sv)
    assert kd.shape == (L,)
    for lvl in range(L):
        one = crit.loss_softkd(nl[lvl], sl[lvl], nb[lvl], sb[lvl], tn[lvl],
                               ts[lvl], batch["box_valid"], sv)
        np.testing.assert_allclose(float(kd[lvl]), float(one), rtol=1e-5)
