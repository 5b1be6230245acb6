"""Per-HLO-op profile of a train step: dete (default), seg, or distill.

Finer-grained companion to bench.py's category breakdown: prints the top-N
individual HLO instructions by device time so layout copies / fusions / serial
while-loops can be attributed to model code. One stage per process (TPU
exclusivity; train-sized executables don't co-reside in 16GB HBM).

Usage: python scripts/prof_train_ops.py [dete|seg|distill] [top_n]
Env: TOIST_PROF_B overrides the stage's per-step batch size.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W = 832, 1344


def _dete_step():
    import __graft_entry__
    from toist_tpu.config import Config, LossConfig, ModelConfig, OptimConfig
    from toist_tpu.models.toist import build_model
    from toist_tpu.train.criterion import build_weight_dict
    from toist_tpu.train.optim import make_optimizer
    from toist_tpu.train.step import init_train_state, make_train_step

    B = int(os.environ.get("TOIST_PROF_B", "6"))
    cfg = Config(model=ModelConfig(contrastive_align_loss=True),
                 optim=OptimConfig(train_batch_size=B),
                 loss=LossConfig(aux_loss=True))
    model = build_model(cfg.model, text_vocab_size=50265)
    batch = __graft_entry__._example_batch(B=B, H=H, W=W, N=25)
    optimizer = make_optimizer(cfg.optim, steps_per_epoch=100,
                               total_steps=1000)
    init_batch = __graft_entry__._example_batch(B=1, H=64, W=64, N=25)
    state, frozen = init_train_state(model, cfg, optimizer, init_batch,
                                     seed=0)
    wd = build_weight_dict(cfg.loss, masks=False,
                           num_dec_layers=cfg.model.dec_layers)
    step = make_train_step(model, cfg, wd, optimizer, frozen)
    return step, state, batch


def _seg_step():
    import __graft_entry__
    from toist_tpu.config import Config, LossConfig, ModelConfig, OptimConfig
    from toist_tpu.models.toist import build_model
    from toist_tpu.train.criterion import build_weight_dict
    from toist_tpu.train.optim import make_optimizer
    from toist_tpu.train.step import init_train_state, make_train_step

    B = int(os.environ.get("TOIST_PROF_B", "2"))
    cfg = Config(model=ModelConfig(contrastive_align_loss=True,
                                   mask_model="smallconv", masks=True,
                                   frozen_detector=True),
                 optim=OptimConfig(train_batch_size=B),
                 loss=LossConfig(aux_loss=False))
    model = build_model(cfg.model, text_vocab_size=50265)
    batch = __graft_entry__._example_batch(B=B, H=H, W=W, N=25,
                                           with_masks=True)
    optimizer = make_optimizer(cfg.optim, steps_per_epoch=100,
                               total_steps=1000, frozen_detector=True)
    init_batch = __graft_entry__._example_batch(B=1, H=64, W=64, N=25,
                                                with_masks=True)
    state, frozen = init_train_state(model, cfg, optimizer, init_batch,
                                     seed=0)
    wd = build_weight_dict(cfg.loss, masks=True,
                           num_dec_layers=cfg.model.dec_layers)
    step = make_train_step(model, cfg, wd, optimizer, frozen, with_masks=True)
    return step, state, batch


def _distill_step():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__
    from toist_tpu.config import Config, LossConfig, ModelConfig, OptimConfig
    from toist_tpu.models.toist import build_model
    from toist_tpu.train import cluster as cluster_lib
    from toist_tpu.train.criterion import build_weight_dict
    from toist_tpu.train.distill import make_distillation_train_step
    from toist_tpu.train.optim import make_optimizer
    from toist_tpu.train.state import TrainState
    from toist_tpu.train.step import (init_train_state, init_variables,
                                      split_variables)

    B = int(os.environ.get("TOIST_PROF_B", "3"))
    cfg = Config(
        model=ModelConfig(contrastive_align_loss=True),
        optim=OptimConfig(train_batch_size=B),
        loss=LossConfig(aux_loss=True, distillation=True, softkd_loss=True,
                        nsthl2_loss=True, cluster=True,
                        cluster_memory_size=1024, cluster_num=3))
    model = build_model(cfg.model, text_vocab_size=50265)

    def make(seed):
        b = __graft_entry__._example_batch(B=B, H=H, W=W, N=25, seed=seed)
        b["noun_token_spans"] = np.tile(np.array([[2, 3]], np.int32),
                                        (B, 25, 1)).reshape(B, 25, 2)
        b["caption_noun_span"] = np.full((B, 2), 2, np.int32)
        b["task_id"] = (np.arange(B) % 14 + 1).astype(np.int32)
        return b

    optimizer = make_optimizer(cfg.optim, steps_per_epoch=100,
                               total_steps=1000)
    init_batch = __graft_entry__._example_batch(B=1, H=64, W=64, N=25)
    state, frozen = init_train_state(model, cfg, optimizer, init_batch,
                                     seed=0)
    tvars = init_variables(model, init_batch, seed=1)
    tparams, tfrozen = split_variables(tvars)
    bank = cluster_lib.init_bank(14, cfg.loss.cluster_memory_size,
                                 cfg.loss.cluster_num, cfg.model.hidden_dim)
    state = TrainState(
        params=state.params,
        opt_state=optimizer.init({"student": state.params,
                                  "teacher": tparams}),
        ema_params=state.ema_params, step=state.step,
        teacher_params=tparams,
        teacher_ema_params=jax.tree_util.tree_map(jnp.copy, tparams),
        cluster_bank=bank)
    wd = build_weight_dict(cfg.loss, masks=False,
                           num_dec_layers=cfg.model.dec_layers)
    step = make_distillation_train_step(model, cfg, wd, optimizer, frozen,
                                        tfrozen)
    batch = {"noun": make(1), "sth": make(2)}
    return step, state, batch


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from toist_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    from toist_tpu.utils import xprof

    args = [a for a in sys.argv[1:]]
    stage = args[0] if args and not args[0].isdigit() else "dete"
    top_n = int(args[-1]) if args and args[-1].isdigit() else 40
    step, state, batch = {"dete": _dete_step, "seg": _seg_step,
                          "distill": _distill_step}[stage]()
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    rng = jax.random.PRNGKey(0)

    state, scalars = step(state, batch, rng)  # compile + warmup
    np.asarray(scalars["loss"])
    tdir = tempfile.mkdtemp(prefix="toist_prof_ops_")
    iters = 3
    with jax.profiler.trace(tdir):
        for _ in range(iters):
            state, scalars = step(state, batch, rng)
        np.asarray(scalars["loss"])
    summary = xprof.summarize_trace(tdir, iters=iters, top_n=top_n)
    shutil.rmtree(tdir, ignore_errors=True)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
