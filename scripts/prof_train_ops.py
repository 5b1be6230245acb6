"""Per-HLO-op profile of the flagship train step (top-N named ops).

Finer-grained companion to bench.py's category breakdown: prints the top-N
individual HLO instructions by device time so layout copies / fusions can be
attributed to model code. One process per run (TPU exclusivity).

Usage: python scripts/prof_train_ops.py [top_n]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, H, W = 6, 832, 1344


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from toist_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import __graft_entry__
    from toist_tpu.config import Config, LossConfig, ModelConfig, OptimConfig
    from toist_tpu.models.toist import build_model
    from toist_tpu.train.criterion import build_weight_dict
    from toist_tpu.train.optim import make_optimizer
    from toist_tpu.train.step import init_train_state, make_train_step
    from toist_tpu.utils import xprof

    top_n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    cfg = Config(model=ModelConfig(contrastive_align_loss=True),
                 optim=OptimConfig(train_batch_size=B),
                 loss=LossConfig(aux_loss=True))
    model = build_model(cfg.model, text_vocab_size=50265)
    batch = __graft_entry__._example_batch(B=B, H=H, W=W, N=25)
    optimizer = make_optimizer(cfg.optim, steps_per_epoch=100,
                               total_steps=1000)
    init_batch = __graft_entry__._example_batch(B=1, H=64, W=64, N=25)
    state, frozen = init_train_state(model, cfg, optimizer, init_batch, seed=0)
    wd = build_weight_dict(cfg.loss, masks=False,
                           num_dec_layers=cfg.model.dec_layers)
    train_step = make_train_step(model, cfg, wd, optimizer, frozen)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(0)

    state, scalars = train_step(state, batch, rng)  # compile+warmup
    np.asarray(scalars["loss"])
    tdir = tempfile.mkdtemp(prefix="toist_prof_ops_")
    with jax.profiler.trace(tdir):
        for _ in range(3):
            state, scalars = train_step(state, batch, rng)
        np.asarray(scalars["loss"])
    summary = xprof.summarize_trace(tdir, iters=3, top_n=top_n)
    shutil.rmtree(tdir, ignore_errors=True)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
