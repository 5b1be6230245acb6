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

CFG = Config(
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

    # Single device (default placement).
    s1, sc1 = train_step(state, batch, rng)

    # 8-device data-parallel placement.
    mesh = mesh_lib.make_mesh((8,), ("data",))
    state8 = mesh_lib.replicate_tree(state, mesh)
    batch8 = mesh_lib.shard_batch(batch, mesh)
    s8, sc8 = train_step(state8, batch8, rng)

    np.testing.assert_allclose(float(sc1["loss"]), float(sc8["loss"]),
                               rtol=2e-5)
    np.testing.assert_allclose(float(sc1["grad_norm"]),
                               float(sc8["grad_norm"]), rtol=2e-4)
    # Updated params agree across the placements.
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), s1.params, s8.params)
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-5
    # Replicated output really is replicated (single value per leaf).
    leaf = jax.tree_util.tree_leaves(s8.params)[0]
    assert leaf.sharding.is_fully_replicated
