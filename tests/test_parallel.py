"""Data-parallel correctness: the sharded step equals the single-device step.

Exercises the mesh/psum path on the 8 virtual CPU devices (SURVEY.md §4 plan):
gradients under the 'data'-sharded batch must match the unsharded computation
bitwise-closely, and replicated state must stay identical across devices.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from toist_tpu.config import Config, LossConfig, ModelConfig, OptimConfig
from toist_tpu.models.toist import build_model
from toist_tpu.parallel import mesh as mesh_lib
from toist_tpu.train.criterion import build_weight_dict
from toist_tpu.train.optim import make_optimizer
from toist_tpu.train.step import init_train_state, make_train_step
from tests.test_train_step import synthetic_batch

# dropout_rng_impl: the default "rbg" PRNG is partitioning-dependent (XLA
# RngBitGenerator draws different bits for a sharded vs unsharded tensor), so
# cross-topology bitwise equality — what this module asserts — requires the
# threefry stream (RunConfig.dropout_rng_impl docs).
from toist_tpu.config import RunConfig

CFG = Config(
    run=RunConfig(dropout_rng_impl="threefry2x32"),
    model=ModelConfig(backbone="resnet18-test", hidden_dim=64, nheads=4,
                      dim_feedforward=128, enc_layers=1, dec_layers=1,
                      num_queries=10, compute_dtype="float32",
                      contrastive_align_loss=False,
                      backbone_norm="group_norm", text_hidden=64,
                      text_layers=1, text_heads=4, text_intermediate=128),
    optim=OptimConfig(lr=1e-3, lr_backbone=1e-3, text_encoder_lr=1e-3,
                      ema=False, schedule="step", lr_drop=1000),
    loss=LossConfig(aux_loss=False),
)


def test_eight_devices_available():
    assert jax.device_count() >= 8, jax.devices()


@pytest.mark.slow
def test_sharded_step_matches_single_device():
    model = build_model(CFG.model, text_vocab_size=600)
    batch = synthetic_batch(B=8, H=64, W=64, N=4, T=12)
    optimizer = make_optimizer(CFG.optim, 10, 1000)
    state, frozen = init_train_state(model, CFG, optimizer, batch, seed=0)
    wd = build_weight_dict(CFG.loss, masks=False, num_dec_layers=1)
    train_step = make_train_step(model, CFG, wd, optimizer, frozen)
    rng = jax.random.PRNGKey(0)

    # 8-device replica made BEFORE the single-device step: the train step
    # donates its input state, so `state` is consumed by the first call.
    mesh = mesh_lib.make_mesh((8,), ("data",))
    state8 = mesh_lib.replicate_tree(state, mesh)
    batch8 = mesh_lib.shard_batch(batch, mesh)

    # Single device (default placement).
    s1, sc1 = train_step(state, batch, rng)
    s8, sc8 = train_step(state8, batch8, rng)

    np.testing.assert_allclose(float(sc1["loss"]), float(sc8["loss"]),
                               rtol=2e-5)
    np.testing.assert_allclose(float(sc1["grad_norm"]),
                               float(sc8["grad_norm"]), rtol=2e-4)
    # Updated params agree across the placements. NB the first AdamW step
    # from zero moments is sign-like (update ~ lr * sign(g)), so a reduction-
    # order bit-flip on any near-zero gradient element moves a param by up to
    # 2*lr; loss/grad_norm above are the tight forward/backward checks.
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), s1.params, s8.params)
    assert max(jax.tree_util.tree_leaves(diffs)) < 2.5 * CFG.optim.lr
    # Replicated output really is replicated (single value per leaf).
    leaf = jax.tree_util.tree_leaves(s8.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_grad_accum_sharded_matches_single_device():
    """optim.grad_accum_steps composes with the data mesh: the in-step
    [accum*B] -> [accum, B] reshape is a GSPMD redistribution, not a
    correctness hazard. Same accum on both placements => identical dropout
    keys, so the comparison is exact under threefry."""
    import dataclasses
    cfg = dataclasses.replace(
        CFG, optim=dataclasses.replace(CFG.optim, train_batch_size=8,
                                       grad_accum_steps=2))
    model = build_model(cfg.model, text_vocab_size=600)
    batch = synthetic_batch(B=16, H=64, W=64, N=4, T=12)
    optimizer = make_optimizer(cfg.optim, 10, 1000)
    state, frozen = init_train_state(model, cfg, optimizer, batch, seed=0)
    wd = build_weight_dict(cfg.loss, masks=False, num_dec_layers=1)
    train_step = make_train_step(model, cfg, wd, optimizer, frozen)
    rng = jax.random.PRNGKey(0)

    mesh = mesh_lib.make_mesh((8,), ("data",))
    state8 = mesh_lib.replicate_tree(state, mesh)
    batch8 = mesh_lib.shard_batch(batch, mesh)

    s1, sc1 = train_step(state, batch, rng)
    s8, sc8 = train_step(state8, batch8, rng)

    np.testing.assert_allclose(float(sc1["loss"]), float(sc8["loss"]),
                               rtol=2e-5)
    np.testing.assert_allclose(float(sc1["grad_norm"]),
                               float(sc8["grad_norm"]), rtol=2e-4)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), s1.params, s8.params)
    assert max(jax.tree_util.tree_leaves(diffs)) < 2.5 * cfg.optim.lr


@pytest.mark.slow
def test_zero1_opt_state_sharding():
    """ZeRO-1 (run.shard_opt_state): AdamW moments sharded over 'data' hold
    1/8 of each big leaf per device, survive a train step with the layout
    pinned, and the numerics match the replicated run."""
    model = build_model(CFG.model, text_vocab_size=600)
    batch = synthetic_batch(B=8, H=64, W=64, N=4, T=12)
    optimizer = make_optimizer(CFG.optim, 10, 1000)
    state, frozen = init_train_state(model, CFG, optimizer, batch, seed=0)
    wd = build_weight_dict(CFG.loss, masks=False, num_dec_layers=1)
    mesh = mesh_lib.make_mesh((8,), ("data",))

    # Replicated baseline.
    step_rep = make_train_step(model, CFG, wd, optimizer, frozen)
    s_rep, sc_rep = step_rep(mesh_lib.replicate_tree(state, mesh),
                             mesh_lib.shard_batch(batch, mesh),
                             jax.random.PRNGKey(0))

    # ZeRO-1 placement + constrained step.
    state_z = mesh_lib.replicate_tree(state, mesh)
    state_z = state_z.replace(
        opt_state=mesh_lib.shard_opt_state(state_z.opt_state, mesh))
    step_z = make_train_step(model, CFG, wd, optimizer, frozen, mesh=mesh)

    # At least one big moment leaf is actually sharded 8-ways, before AND
    # after the step (the constraint keeps the layout stable).
    def sharded_fraction(opt_state):
        n_sharded = n_big = 0
        for leaf in jax.tree_util.tree_leaves(opt_state):
            if leaf.size >= 2 ** 12:
                n_big += 1
                shard = leaf.addressable_shards[0].data
                if shard.size == leaf.size // 8:
                    n_sharded += 1
        return n_sharded, n_big

    # Measure the pre-step sharding before the donating step consumes state_z.
    pre_sharded, pre_big = sharded_fraction(state_z.opt_state)
    s_z, sc_z = step_z(state_z, mesh_lib.shard_batch(batch, mesh),
                       jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(sc_rep["loss"]), float(sc_z["loss"]),
                               rtol=2e-5)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), s_rep.params, s_z.params)
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-5

    post_sharded, post_big = sharded_fraction(s_z.opt_state)
    assert pre_big > 0 and pre_sharded == pre_big, (pre_sharded, pre_big)
    assert post_sharded == post_big, (post_sharded, post_big)


@pytest.mark.slow
def test_freeze_text_encoder():
    """model.freeze_text_encoder: text-encoder params take no updates while
    the rest trains (reference main.py:146-153, transformer.py:66-69)."""
    import dataclasses

    # Flag set at the cfg level too (as main.py does), so the step applies
    # stop_frozen_gradients and the text backward is DCE'd, not just zeroed.
    fcfg = dataclasses.replace(
        CFG, model=dataclasses.replace(CFG.model, freeze_text_encoder=True))
    model = build_model(fcfg.model, text_vocab_size=600)
    batch = synthetic_batch(B=2, H=64, W=64, N=4, T=12)
    optimizer = make_optimizer(fcfg.optim, 10, 1000, freeze_text_encoder=True)
    state, frozen = init_train_state(model, fcfg, optimizer, batch, seed=0)
    wd = build_weight_dict(fcfg.loss, masks=False, num_dec_layers=1)
    step = make_train_step(model, fcfg, wd, optimizer, frozen)
    # Snapshot before the step: the train step donates (consumes) its input.
    old_params = jax.device_get(state.params)
    s1, _ = step(state, batch, jax.random.PRNGKey(0))

    def max_delta(sub_old, sub_new):
        d = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(np.asarray(a) - np.asarray(b)).max()),
            sub_old, sub_new)
        return max(jax.tree_util.tree_leaves(d))

    assert max_delta(old_params["text_encoder"],
                     s1.params["text_encoder"]) == 0.0
    assert max_delta(old_params["decoder"], s1.params["decoder"]) > 0.0


@pytest.mark.slow
def test_distillation_bank_identical_under_sharding():
    """The cluster bank must evolve identically whether the batch is sharded
    over 8 devices or runs on one (SURVEY.md §7 hard part 5: deterministic
    global-batch-order updates replace the reference's all_gather + re-sync)."""
    import jax.numpy as jnp

    from toist_tpu.config import LossConfig
    from toist_tpu.models.toist import build_model
    from toist_tpu.train import cluster as cl
    from toist_tpu.train.distill import make_distillation_train_step
    from toist_tpu.train.state import TrainState
    from toist_tpu.train.step import init_variables, split_variables
    from tests.test_distillation import _paired_batch

    cfg = CFG.replace(loss=LossConfig(
        aux_loss=False, distillation=True, softkd_loss=True,
        nsthl2_loss=True, nsthl2_coef=1.0, cluster=True,
        cluster_memory_size=16, cluster_num=2, kmeans_max_iters=8))
    model = build_model(cfg.model, text_vocab_size=600)
    batches = _paired_batch()
    # Widen to 8 samples for an even shard.
    def widen(b):
        return {k: jnp.concatenate([v] * 4, axis=0) for k, v in b.items()}
    batches = {k: widen(v) for k, v in batches.items()}
    optimizer = make_optimizer(cfg.optim, 10, 1000)
    from toist_tpu.train.step import init_train_state
    state, frozen = init_train_state(model, cfg, optimizer, batches["sth"],
                                     seed=0)
    tvars = init_variables(model, batches["noun"], seed=1)
    tparams, tfrozen = split_variables(tvars)
    bank = cl.init_bank(14, 16, 2, cfg.model.hidden_dim)
    state = TrainState(
        params=state.params,
        opt_state=optimizer.init({"student": state.params,
                                  "teacher": tparams}),
        ema_params=None, step=jnp.int32(0), teacher_params=tparams,
        teacher_ema_params=None, cluster_bank=bank)
    from toist_tpu.train.criterion import build_weight_dict
    wd = build_weight_dict(cfg.loss, masks=False, num_dec_layers=1)
    step = make_distillation_train_step(model, cfg, wd, optimizer, frozen,
                                        tfrozen)
    rng = jax.random.PRNGKey(0)

    # Replicate before the first step: the train step donates its input.
    mesh = mesh_lib.make_mesh((8,), ("data",))
    state8 = mesh_lib.replicate_tree(state, mesh)
    b8 = mesh_lib.shard_batch(batches, mesh)

    s1, sc1 = step(state, batches, rng)
    s8, sc8 = step(state8, b8, rng)

    np.testing.assert_allclose(float(sc1["loss"]), float(sc8["loss"]),
                               rtol=3e-5)
    np.testing.assert_allclose(
        np.asarray(s1.cluster_bank.feature_bank),
        np.asarray(s8.cluster_bank.feature_bank), atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(s1.cluster_bank.update_count),
        np.asarray(s8.cluster_bank.update_count))


# ---------------------------------------------------------------------------
# Tensor parallelism (parallel/tp.py): Megatron-style parameter placement
# over a 2-D ('data', 'model') mesh. The reference has no analogue (DDP
# only); correctness bar is exact agreement with the single-device step.
# ---------------------------------------------------------------------------

def test_tp_spec_policy():
    from jax.sharding import PartitionSpec as P

    from toist_tpu.parallel.tp import tp_spec

    k2 = np.zeros((64, 64), np.float32)
    b1 = np.zeros((64,), np.float32)
    # Column-parallel producers shard output features / bias.
    assert tp_spec(("enc", "self_attn", "q_proj", "kernel"), k2, 4) == \
        P(None, "model")
    assert tp_spec(("enc", "self_attn", "v_proj", "bias"), b1, 4) == \
        P("model")
    assert tp_spec(("l", "ffn", "linear1", "kernel"), k2, 4) == \
        P(None, "model")
    assert tp_spec(("te", "layer_0", "intermediate", "kernel"), k2, 4) == \
        P(None, "model")
    # Row-parallel consumers shard input features; bias replicated.
    assert tp_spec(("enc", "self_attn", "out_proj", "kernel"), k2, 4) == \
        P("model", None)
    assert tp_spec(("enc", "self_attn", "out_proj", "bias"), b1, 4) == P()
    assert tp_spec(("l", "ffn", "linear2", "kernel"), k2, 4) == \
        P("model", None)
    # Unmatched modules and indivisible shapes stay replicated.
    assert tp_spec(("backbone", "conv1", "kernel"),
                   np.zeros((7, 7, 3, 64)), 4) == P()
    assert tp_spec(("enc", "self_attn", "q_proj", "kernel"),
                   np.zeros((64, 62)), 4) == P()
    assert tp_spec(("norm1", "scale"), b1, 4) == P()


@pytest.mark.slow
def test_tp_step_matches_single_device():
    """One train step on a (2, 4) ('data', 'model') mesh with TP parameter
    placement + composed ZeRO-1 == the single-device step, and the layout is
    real (q_proj kernel physically 1/4-sharded) and stable across the step."""
    from jax.sharding import NamedSharding

    from toist_tpu.parallel import tp as tp_lib

    model = build_model(CFG.model, text_vocab_size=600)
    batch = synthetic_batch(B=8, H=64, W=64, N=4, T=12)
    optimizer = make_optimizer(CFG.optim, 10, 1000)
    state, frozen = init_train_state(model, CFG, optimizer, batch, seed=0)
    wd = build_weight_dict(CFG.loss, masks=False, num_dec_layers=1)
    rng = jax.random.PRNGKey(0)

    mesh2 = mesh_lib.make_mesh((2, 4), ("data", "model"))
    state_tp = mesh_lib.replicate_tree(state, mesh2)
    state_tp = state_tp.replace(
        params=tp_lib.shard_params(state_tp.params, mesh2),
        opt_state=mesh_lib.shard_opt_state(state_tp.opt_state, mesh2))

    def qproj(params):
        return params["encoder"]["layer_0"]["self_attn"]["q_proj"]["kernel"]

    def assert_tp_layout(params):
        leaf = qproj(params)
        assert isinstance(leaf.sharding, NamedSharding)
        assert "model" in str(leaf.sharding.spec), leaf.sharding
        shard = leaf.addressable_shards[0].data
        assert shard.shape == (leaf.shape[0], leaf.shape[1] // 4), shard.shape

    assert_tp_layout(state_tp.params)

    step_1d = make_train_step(model, CFG, wd, optimizer, frozen)
    step_tp = make_train_step(model, CFG, wd, optimizer, frozen, mesh=mesh2)
    s1, sc1 = step_1d(state, batch, rng)
    s2, sc2 = step_tp(state_tp, mesh_lib.shard_batch(batch, mesh2), rng)

    np.testing.assert_allclose(float(sc1["loss"]), float(sc2["loss"]),
                               rtol=2e-5)
    np.testing.assert_allclose(float(sc1["grad_norm"]),
                               float(sc2["grad_norm"]), rtol=2e-4)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), s1.params, s2.params)
    assert max(jax.tree_util.tree_leaves(diffs)) < 2.5 * CFG.optim.lr
    # constrain_params kept the layout through the update.
    assert_tp_layout(s2.params)
    # ZeRO-1 composed with TP: the q_proj moment leaves carry BOTH axes.
    mu_leaf = None
    for path, leaf in jax.tree_util.tree_flatten_with_path(s2.opt_state)[0]:
        names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
        if "q_proj" in names and names[-1] == "kernel" and \
                getattr(leaf, "ndim", 0) == 2:
            mu_leaf = leaf
            break
    assert mu_leaf is not None
    spec = str(mu_leaf.sharding.spec)
    assert "model" in spec and "data" in spec, spec
