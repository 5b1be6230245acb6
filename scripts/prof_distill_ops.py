"""Per-HLO-op profile of the distillation train step (batch 3x2, cluster on).

Companion to prof_train_ops.py for the weakest-MFU trainable workload:
attributes the distillation step's device time (teacher+student streams, bank
update, bounded k-means, batched softkd) to HLO categories / named ops so the
extra cost over the plain step is explainable. One process per run.

Usage: python scripts/prof_distill_ops.py [top_n]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, H, W = 3, 832, 1344


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from toist_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

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
    from toist_tpu.utils import xprof

    top_n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
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
    dstep = make_distillation_train_step(model, cfg, wd, optimizer, frozen,
                                         tfrozen)
    batches = {"noun": {k: jnp.asarray(v) for k, v in make(1).items()},
               "sth": {k: jnp.asarray(v) for k, v in make(2).items()}}
    rng = jax.random.PRNGKey(0)

    state, scalars = dstep(state, batches, rng)  # compile+warmup
    np.asarray(scalars["loss"])
    tdir = tempfile.mkdtemp(prefix="toist_prof_dis_")
    with jax.profiler.trace(tdir):
        for _ in range(3):
            state, scalars = dstep(state, batches, rng)
        np.asarray(scalars["loss"])
    summary = xprof.summarize_trace(tdir, iters=3, top_n=top_n)
    shutil.rmtree(tdir, ignore_errors=True)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
