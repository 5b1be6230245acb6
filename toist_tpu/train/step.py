"""Jitted train / eval steps.

One optimization step (reference engine.py:23-116 train_one_epoch_plain body):
forward (two-phase fused), criterion with on-device Hungarian matching, weighted sum,
grad, clip, AdamW update with per-group schedules, EMA — all inside a single jit
compiled once per batch bucket. The NaN guard (engine.py:82-85) is returned as a
finite-flag metric; the host loop decides to abort.

Variable collections: the trainable 'params' collection lives in TrainState.params;
non-trainable buffers (FrozenBN statistics, the 'frozen' collection — the analogue of
the reference's FrozenBatchNorm2d buffers, backbone.py:21-58) ride along in
TrainState via `frozen` and are never differentiated.

Sharding: the caller places the batch with the 'data'-axis sharding and params
replicated (parallel/mesh.py); XLA derives the gradient psum.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from toist_tpu.config import Config
from toist_tpu.models.postprocess import postprocess_boxes
from toist_tpu.train import criterion as crit
from toist_tpu.train.optim import ema_update
from toist_tpu.train.state import TrainState


def split_variables(variables: Any) -> Tuple[Any, Dict[str, Any]]:
    """flax init output -> (trainable params, frozen collections)."""
    params = variables["params"]
    frozen = {k: v for k, v in variables.items() if k != "params"}
    return params, frozen


def make_dropout_rng(rng: jax.Array, step: jnp.ndarray,
                     impl: str = "rbg") -> jax.Array:
    """Per-step dropout key on the configured PRNG implementation.

    Threefry mask generation dominates the train forward at flagship shapes
    (the attention-probs dropout draws ~400M random bits/step); re-keying the
    dropout stream onto "rbg" (XLA RngBitGenerator) cuts the measured forward
    from 149.8ms to 39.4ms on v5e. See RunConfig.dropout_rng_impl.
    """
    k = jax.random.fold_in(rng, step)
    if impl in ("threefry2x32", ""):
        return k
    data = jax.random.key_data(jax.random.split(k, 2)).reshape(-1)[:4]
    return jax.random.wrap_key_data(data, impl=impl)


def model_forward(model, params, frozen, batch, rngs=None, deterministic=True):
    variables = {"params": params, **frozen}
    return model.apply(
        variables, batch["images"], batch["image_mask"], batch["text_ids"],
        batch["text_mask"], deterministic=deterministic, rngs=rngs)


def accumulate_gradients(vg_fn: Callable, bank, batch, rng: jax.Array,
                         accum: int):
    """Gradient accumulation: scan `accum` microbatches, average gradients.

    vg_fn(bank, batch, rng) -> ((loss, (scalars, bank)), grads) — a
    value_and_grad closure with the params already bound. accum == 1 calls it
    directly on the full batch. Otherwise the batch's leading dim
    (accum * B) is reshaped to [accum, B, ...] and scanned; each microbatch's
    losses are normalized by global_num_boxes / accum (injected as
    batch["num_boxes_override"]) so the averaged gradients exactly equal one
    step over the full batch — the reference's DDP semantics (cross-rank
    num_boxes mean + gradient allreduce mean, mdetr.py:996-1001 +
    engine.py:88; equality pinned by tests/test_train_step.py). The cluster
    bank threads through the scan in microbatch order (the reference inserts
    its all-gathered rows in rank order, mdetr.py:62-103). Dropout keys are
    decorrelated per microbatch via fold_in. Scalars are microbatch means.
    """
    if accum <= 1:
        return vg_fn(bank, batch, rng)
    from toist_tpu.train import criterion as crit
    # Distillation passes paired {"noun": Batch, "sth": Batch} trees; plain
    # training a flat Batch. num_boxes is per stream (the reference computes
    # it per SetCriterion call; paired streams share geometry so the values
    # coincide, mdetr.py:880-989).
    paired = "box_valid" not in batch
    streams = batch if paired else {None: batch}
    nb = {k: crit.compute_num_boxes(b["box_valid"], b["sample_valid"])
          for k, b in streams.items()}
    micro = jax.tree_util.tree_map(
        lambda x: x.reshape((accum, x.shape[0] // accum) + x.shape[1:]),
        batch)

    def run(bank, mb, r):
        if paired:
            mb = {k: dict(mb[k], num_boxes_override=nb[k] / accum)
                  for k in mb}
        else:
            mb = dict(mb, num_boxes_override=nb[None] / accum)
        (loss, (scalars, new_bank)), grads = vg_fn(bank, mb, r)
        return (loss, scalars, grads), new_bank

    mb0 = jax.tree_util.tree_map(lambda x: x[0], micro)
    acc_shapes, _ = jax.eval_shape(run, bank, mb0, rng)
    acc0 = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), acc_shapes)

    def body(carry, xs):
        bank, acc = carry
        idx, mb = xs
        out, bank = run(bank, mb, jax.random.fold_in(rng, idx))
        acc = jax.tree_util.tree_map(jnp.add, acc, out)
        return (bank, acc), None

    (bank, (loss_sum, scalars_sum, grads_sum)), _ = jax.lax.scan(
        body, (bank, acc0), (jnp.arange(accum), micro))
    inv = 1.0 / accum
    mean = lambda t: jax.tree_util.tree_map(lambda x: x * inv, t)
    return (loss_sum * inv, (mean(scalars_sum), bank)), mean(grads_sum)


def make_train_step(model, cfg: Config, weight_dict: Dict[str, float],
                    optimizer: optax.GradientTransformation, frozen: Dict,
                    with_masks: bool = False, mesh=None) -> Callable:
    """Plain (non-distillation) train step.

    When cfg.loss.cluster is on (e.g. seg training over a frozen distilled
    detector, scripts/train_seg_dis.sh), the reference runs infer_choice
    between the phases (engine.py:63-66): the "something" span is snapped to
    its cluster center, no cluster loss. The bank centers still evolve
    (mdetr.py:225) and are threaded through TrainState.cluster_bank.
    """
    use_cluster = cfg.loss.cluster

    def loss_fn(params, bank, batch, rng):
        # Symbolic-zero grads for frozen groups (stem+layer1 always; the whole
        # detector in frozen_detector seg training; RoBERTa under
        # freeze_text_encoder): XLA DCEs their backward and the clip norm
        # matches torch's trainable-only norm (see stop_frozen_gradients).
        from toist_tpu.train.optim import stop_frozen_gradients
        params = stop_frozen_gradients(
            params, frozen_detector=cfg.model.frozen_detector,
            freeze_text_encoder=cfg.model.freeze_text_encoder)
        rngs = {"dropout": rng}
        if use_cluster:
            from toist_tpu.train import cluster as cl
            cache = model.apply(
                {"params": params, **frozen}, batch["images"],
                batch["image_mask"], batch["text_ids"], batch["text_mask"],
                deterministic=False, rngs=rngs, method=model.encode)
            bank, mod, _aux = cl.student_cluster(
                bank, cache, batch, cfg.loss.kmeans_max_iters,
                cfg.loss.kmeans_tol, train=False)
            cache = dict(cache)
            cache["img_memory_mod"] = mod
            out = model.apply(
                {"params": params, **frozen}, cache, deterministic=False,
                use_modified_memory=True, rngs=rngs, method=model.decode)
        else:
            out, cache = model_forward(model, params, frozen, batch,
                                       rngs=rngs, deterministic=False)
        losses = crit.set_criterion(out, batch, cfg.loss)
        t2q = losses.pop("_tgt2query")
        if with_masks:
            # Run the mask head only on the Hungarian-matched queries
            # (identical math to the reference's all-queries pass, ~4x cheaper).
            pred_masks_sel = model.apply(
                {"params": params, **frozen}, cache, out["hs"][-1],
                jax.lax.stop_gradient(t2q), method=model.compute_masks)
            losses.update(crit.mask_losses(
                pred_masks_sel, batch["gt_masks"], batch["box_valid"],
                batch["sample_valid"],
                num_boxes=batch.get("num_boxes_override")))
        total = crit.total_loss(losses, weight_dict)
        scalars = {k: v for k, v in losses.items() if not k.startswith("_")}
        scalars["loss"] = total
        return total, (scalars, bank)

    import functools

    # donate_argnums: the input TrainState is consumed, letting XLA alias the
    # f32 param/moment/EMA buffers in place instead of allocating fresh copies
    # (~2GB of state at flagship scale) every step.
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        step_rng = make_dropout_rng(rng, state.step,
                                    cfg.run.dropout_rng_impl)
        (loss, (scalars, bank)), grads = accumulate_gradients(
            functools.partial(jax.value_and_grad(loss_fn, has_aux=True),
                              state.params),
            state.cluster_bank, batch, step_rng,
            cfg.optim.grad_accum_steps)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        if cfg.run.shard_opt_state and mesh is not None:
            from toist_tpu.parallel.mesh import constrain_opt_state
            opt_state = constrain_opt_state(opt_state, mesh)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:
            ema = ema_update(ema, params, cfg.optim.ema_decay)
        if mesh is not None:
            from toist_tpu.parallel.tp import constrain_params
            params = constrain_params(params, mesh)
            if ema is not None:
                ema = constrain_params(ema, mesh)
        new_state = state.replace(params=params, opt_state=opt_state,
                                  ema_params=ema, cluster_bank=bank,
                                  step=state.step + 1)
        scalars["grad_norm"] = optax.global_norm(grads)
        scalars["loss_is_finite"] = jnp.isfinite(loss)
        return new_state, scalars

    return train_step


def make_eval_step(model, cfg: Config, weight_dict: Dict[str, float],
                   frozen: Dict, with_masks: bool = False) -> Callable:
    """Forward + postprocess (reference engine.py:253-342 body, minus the
    evaluator update which is host-side).

    run.compute_eval_losses=False skips the criterion (incl. its 6-level
    Hungarian solve) — the reference always pays it just for loss logging
    (engine.py:300-305); predictions and COCO metrics are unaffected."""

    @jax.jit
    def eval_step(params, batch):
        out, cache = model_forward(model, params, frozen, batch,
                                   deterministic=True)
        if cfg.run.compute_eval_losses:
            losses = crit.set_criterion(out, batch, cfg.loss)
            losses.pop("_tgt2query")
            scalars = {k: v for k, v in losses.items()
                       if not k.startswith("_")}
            scalars["loss"] = crit.total_loss(losses, weight_dict)
        else:
            scalars = {}
        post = postprocess_boxes(out["pred_logits"], out["pred_boxes"],
                                 batch["orig_size"])
        result = {"post": post, "scalars": scalars}
        if with_masks:
            result["pred_masks"] = model.apply(
                {"params": params, **frozen}, cache, out["hs"][-1], None,
                method=model.compute_masks)
        return result

    return eval_step


def init_variables(model, sample_batch, seed: int = 0):
    rng = jax.random.PRNGKey(seed)
    init = jax.jit(lambda r, *a: model.init(r, *a, method=model.init_forward))
    return init(rng, sample_batch["images"], sample_batch["image_mask"],
                sample_batch["text_ids"], sample_batch["text_mask"])


def init_train_state(model, cfg: Config, optimizer, sample_batch,
                     seed: int = 0,
                     use_ema: Optional[bool] = None) -> Tuple[TrainState, Dict]:
    variables = init_variables(model, sample_batch, seed)
    params, frozen = split_variables(variables)
    opt_state = optimizer.init(params)
    if use_ema is None:
        use_ema = cfg.optim.ema
    ema = jax.tree_util.tree_map(jnp.copy, params) if use_ema else None
    state = TrainState(params=params, opt_state=opt_state, ema_params=ema,
                       step=jnp.int32(0))
    return state, frozen
