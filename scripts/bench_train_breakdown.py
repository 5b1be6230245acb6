"""Where does the train step's time go? Coarse jitted-stage breakdown.

Times, at the flagship batch-6 832x1344 train setting:
  fwd_loss      forward + matching + losses (no grad)
  grad          jax.value_and_grad of the same
  full_step     grad + clip + grouped AdamW + EMA (the real train step)
  fwd_nomatch   forward + losses with a FIXED assignment (isolates matching)

Prints one JSON line with per-stage ms.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, H, W = 6, 832, 1344


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from toist_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import __graft_entry__
    from toist_tpu.config import Config, ModelConfig, OptimConfig
    from toist_tpu.models.toist import build_model
    from toist_tpu.train import criterion as crit
    from toist_tpu.train.criterion import build_weight_dict
    from toist_tpu.train.optim import make_optimizer
    from toist_tpu.train.step import init_train_state, make_train_step

    cfg = Config(model=ModelConfig(contrastive_align_loss=True),
                 optim=OptimConfig(train_batch_size=B))
    model = build_model(cfg.model, text_vocab_size=50265)
    batch = __graft_entry__._example_batch(B=B, H=H, W=W, N=25)
    optimizer = make_optimizer(cfg.optim, steps_per_epoch=100,
                               total_steps=1000)
    state, frozen = init_train_state(model, cfg, optimizer, batch, seed=0)
    wd = build_weight_dict(cfg.loss, masks=False,
                           num_dec_layers=cfg.model.dec_layers)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(0)

    def loss_fn(params, chain, fixed_match=False):
        b = dict(batch)
        if b["images"].dtype == jnp.uint8:
            b["images"] = b["images"] + (chain * 0).astype(jnp.uint8)
        else:
            b["images"] = b["images"] + chain * 1e-30
        out, _ = model.apply({"params": params, **frozen}, b["images"],
                             b["image_mask"], b["text_ids"], b["text_mask"],
                             deterministic=False, rngs={"dropout": rng})
        if fixed_match:
            t2q = jnp.where(b["box_valid"],
                            jnp.arange(b["box_valid"].shape[1])[None, :], -1)
            num_boxes = crit.compute_num_boxes(b["box_valid"],
                                               b["sample_valid"])
            losses = {}
            names = [""] + [f"_{i}" for i in
                            range(out["aux_pred_logits"].shape[0])]
            logits = [out["pred_logits"]] + list(out["aux_pred_logits"])
            pboxes = [out["pred_boxes"]] + list(out["aux_pred_boxes"])
            tot = jnp.float32(0.0)
            for nm, lg, pb in zip(names, logits, pboxes):
                tot += crit.loss_labels(lg, b["positive_map"], t2q,
                                        b["box_valid"],
                                        b["sample_valid"].astype(jnp.float32),
                                        0.1, num_boxes)
                l1, gi = crit.loss_boxes(pb, b["boxes"], t2q, b["box_valid"],
                                         num_boxes)
                tot += 5.0 * l1 + 2.0 * gi
            return tot
        losses = crit.set_criterion(out, b, cfg.loss)
        return crit.total_loss(losses, wd)

    def timeit(fn, *args, iters=10):
        chain = jnp.float32(0.0)
        r = fn(*args, chain)
        np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
        t0 = time.time()
        for _ in range(iters):
            r = fn(*args, chain)
        np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
        return (time.time() - t0) / iters * 1e3

    # One stage per process: holding several compiled train-sized
    # executables at once exhausts HBM.
    stage = sys.argv[1] if len(sys.argv) > 1 else "all"
    res = {}
    if stage in ("fwd_loss", "all"):
        fwd = jax.jit(lambda p, c: loss_fn(p, c))
        res["fwd_loss_ms"] = timeit(fwd, state.params)
    if stage in ("fwd_nomatch", "all"):
        fwd_nm = jax.jit(lambda p, c: loss_fn(p, c, fixed_match=True))
        res["fwd_nomatch_ms"] = timeit(fwd_nm, state.params)
    if stage in ("grad", "all"):
        grad = jax.jit(lambda p, c: jax.value_and_grad(
            lambda q: loss_fn(q, c))(p))
        res["grad_ms"] = timeit(grad, state.params)
    if stage in ("full_step", "all"):
        train_step = make_train_step(model, cfg, wd, optimizer, frozen)

        # The train step DONATES its input state (CLAUDE.md invariant), so the
        # timing loop must thread the returned state instead of reusing the
        # donated one (reuse raises InvalidArgument on the second call).
        def run_step(state):
            s2, sc = train_step(state, dict(batch), rng)
            return s2, sc["loss"]

        state, loss = run_step(state)                     # compile + warmup
        np.asarray(loss)
        t0 = time.time()
        iters = 10
        for _ in range(iters):
            state, loss = run_step(state)
        np.asarray(loss)
        res["full_step_ms"] = (time.time() - t0) / iters * 1e3
    print(json.dumps({k: round(v, 2) for k, v in res.items()}))


if __name__ == "__main__":
    main()
