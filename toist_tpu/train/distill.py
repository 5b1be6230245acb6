"""Noun-pronoun distillation: dual-model train step + cluster-aware eval step.

Reference flow (engine.py:119-250 train_one_epoch_distillation):
  teacher (noun captions) forward -> cluster bank update + noun-span snapping ->
  student (pronoun captions) forward -> "something"-span snapping + cluster losses ->
  per-stream set losses (noun_/sth_ prefixes) + softkd (main + aux) + nsthl2 ->
  one backward over BOTH models' params -> dual EMA.

Both models share one architecture; params live under {"student", "teacher"} in
TrainState.params so one optimizer updates all six reference param groups
(main.py:351-392). The ClusterBank pytree is threaded through the step and updated
under stop_gradient.
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from toist_tpu.config import Config
from toist_tpu.models.postprocess import postprocess_boxes
from toist_tpu.train import cluster as cl
from toist_tpu.train import criterion as crit
from toist_tpu.train.optim import ema_update
from toist_tpu.train.state import TrainState
from toist_tpu.train.step import make_dropout_rng


def _apply_encode(model, params, frozen, batch, rngs, deterministic):
    return model.apply({"params": params, **frozen},
                       batch["images"], batch["image_mask"],
                       batch["text_ids"], batch["text_mask"],
                       deterministic=deterministic, rngs=rngs,
                       method=model.encode)


def _apply_decode(model, params, frozen, cache, rngs, deterministic,
                  use_modified):
    return model.apply({"params": params, **frozen}, cache,
                       deterministic=deterministic,
                       use_modified_memory=use_modified, rngs=rngs,
                       method=model.decode)


def make_distillation_train_step(model, cfg: Config,
                                 weight_dict: Dict[str, float],
                                 optimizer: optax.GradientTransformation,
                                 frozen_student: Dict, frozen_teacher: Dict,
                                 mesh=None) -> Callable:
    lcfg = cfg.loss
    use_cluster = lcfg.cluster

    def loss_fn(params, bank, batches, rng):
        # Symbolic-zero grads for both models' frozen groups (stem+layer1;
        # RoBERTa under freeze_text_encoder) — see train/optim.py
        # stop_frozen_gradients. label_params matches on path substrings, so
        # the {"student","teacher"} nesting is transparent to it.
        from toist_tpu.train.optim import stop_frozen_gradients
        params = stop_frozen_gradients(
            params, frozen_detector=cfg.model.frozen_detector,
            freeze_text_encoder=cfg.model.freeze_text_encoder)
        noun_b, sth_b = batches["noun"], batches["sth"]
        r1, r2, r3, r4 = jax.random.split(rng, 4)

        # Teacher (noun) stream.
        tcache = _apply_encode(model, params["teacher"], frozen_teacher,
                               noun_b, {"dropout": r1}, False)
        if use_cluster:
            bank, t_mod, _taux = cl.teacher_update_and_snap(
                bank, tcache, noun_b, lcfg.kmeans_max_iters, lcfg.kmeans_tol,
                lcfg.fifo_memory)
            tcache = dict(tcache)
            tcache["img_memory_mod"] = t_mod
        tout = _apply_decode(model, params["teacher"], frozen_teacher, tcache,
                             {"dropout": r2}, False, use_cluster)

        # Student (pronoun) stream.
        scache = _apply_encode(model, params["student"], frozen_student,
                               sth_b, {"dropout": r3}, False)
        cluster_losses = {}
        if use_cluster:
            bank, s_mod, saux = cl.student_cluster(
                bank, scache, sth_b, lcfg.kmeans_max_iters, lcfg.kmeans_tol,
                train=True)
            scache = dict(scache)
            scache["img_memory_mod"] = s_mod
            cluster_losses = {
                "loss_cluster_feature": saux["loss_cluster_feature"],
                "loss_cluster_choice": saux["loss_cluster_choice"],
            }
        sout = _apply_decode(model, params["student"], frozen_student, scache,
                             {"dropout": r4}, False, use_cluster)

        losses = {}
        losses.update(crit.set_criterion(tout, noun_b, lcfg, prefix="noun_"))
        losses.update(crit.set_criterion(sout, sth_b, lcfg, prefix="sth_"))
        losses.update(cluster_losses)

        bv = sth_b["box_valid"]
        sv = sth_b["sample_valid"]
        if lcfg.softkd_loss:
            if lcfg.aux_loss and "aux_pred_logits" in tout:
                # All 6 levels' FP re-pairing solves batched into one lockstep
                # solve (crit.loss_softkd_levels); level order: aux 0..4, main.
                n_aux = tout["aux_pred_logits"].shape[0]
                cat = lambda o, k: jnp.concatenate(
                    [o[f"aux_{k}"], o[k][None]], axis=0)
                stack_t2q = lambda p: jnp.stack(
                    [losses[f"_{p}_tgt2query_{i}"] for i in range(n_aux)]
                    + [losses[f"_{p}_tgt2query"]], axis=0)
                kd = crit.loss_softkd_levels(
                    cat(tout, "pred_logits"), cat(sout, "pred_logits"),
                    cat(tout, "pred_boxes"), cat(sout, "pred_boxes"),
                    stack_t2q("noun"), stack_t2q("sth"), bv, sv)
                losses["loss_softkd"] = kd[-1]
                for i in range(n_aux):
                    losses[f"loss_softkd_{i}"] = kd[i]
            else:
                losses["loss_softkd"] = crit.loss_softkd(
                    tout["pred_logits"], sout["pred_logits"],
                    tout["pred_boxes"], sout["pred_boxes"],
                    losses["_noun_tgt2query"], losses["_sth_tgt2query"],
                    bv, sv)
        if lcfg.nsthl2_loss:
            losses["loss_nsthl2"] = crit.loss_nsthl2(
                tcache["text_memory"], scache["text_memory"],
                noun_b["noun_token_spans"], sth_b["noun_token_spans"], bv, sv)

        total = crit.total_loss(losses, weight_dict)
        scalars = {k: v for k, v in losses.items() if not k.startswith("_")}
        scalars["loss"] = total
        return total, (scalars, bank)

    import functools

    # Input state donated (aliased in place) — see train/step.py rationale.
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batches, rng
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        step_rng = make_dropout_rng(rng, state.step,
                                    cfg.run.dropout_rng_impl)
        params = {"student": state.params, "teacher": state.teacher_params}
        import functools

        from toist_tpu.train.step import accumulate_gradients
        (loss, (scalars, bank)), grads = accumulate_gradients(
            functools.partial(jax.value_and_grad(loss_fn, has_aux=True),
                              params),
            state.cluster_bank, batches, step_rng,
            cfg.optim.grad_accum_steps)
        updates, opt_state = optimizer.update(grads, state.opt_state, params)
        if cfg.run.shard_opt_state and mesh is not None:
            from toist_tpu.parallel.mesh import constrain_opt_state
            opt_state = constrain_opt_state(opt_state, mesh)
        new_params = optax.apply_updates(params, updates)
        ema = state.ema_params
        if ema is not None:
            ema = ema_update(ema, new_params["student"], cfg.optim.ema_decay)
        tema = state.teacher_ema_params
        if tema is not None:
            tema = ema_update(tema, new_params["teacher"], cfg.optim.ema_decay)
        if mesh is not None:
            from toist_tpu.parallel.tp import constrain_params
            new_params = constrain_params(new_params, mesh)
            ema = constrain_params(ema, mesh) if ema is not None else None
            tema = constrain_params(tema, mesh) if tema is not None else None
        new_state = state.replace(
            params=new_params["student"], teacher_params=new_params["teacher"],
            opt_state=opt_state, ema_params=ema, teacher_ema_params=tema,
            cluster_bank=bank, step=state.step + 1)
        scalars["grad_norm"] = optax.global_norm(grads)
        scalars["loss_is_finite"] = jnp.isfinite(loss)
        # Per-task bank health telemetry (reference engine.py:190-193 pushes
        # fill counts to TB every epoch; here they ride the scalar dict and
        # land in log.jsonl as lists).
        scalars["bank_update_count"] = bank.update_count
        scalars["bank_full"] = bank.full.astype(jnp.int32)
        return new_state, scalars

    return train_step


def make_cluster_eval_step(model, cfg: Config, weight_dict: Dict[str, float],
                           frozen: Dict) -> Callable:
    """Eval with infer_choice snapping between encode and decode
    (reference engine.py:288-291 + mdetr.py:282-312). Bank is read-only except
    for the center warm-start refresh, which is discarded.

    run.compute_eval_losses=False skips the criterion like make_eval_step does
    (train/step.py) — the cluster path pays the largest 6-level Hungarian
    solve, so serving eval gains the most from turning it off; predictions and
    COCO metrics are unaffected (the reference always pays it for loss
    logging, engine.py:300-305)."""
    lcfg = cfg.loss

    @jax.jit
    def eval_step(params, bank, batch):
        cache = _apply_encode(model, params, frozen, batch, None, True)
        _bank2, mod, _aux = cl.student_cluster(
            bank, cache, batch, lcfg.kmeans_max_iters, lcfg.kmeans_tol,
            train=False)
        cache = dict(cache)
        cache["img_memory_mod"] = mod
        out = _apply_decode(model, params, frozen, cache, None, True, True)
        post = postprocess_boxes(out["pred_logits"], out["pred_boxes"],
                                 batch["orig_size"])
        if cfg.run.compute_eval_losses:
            losses = crit.set_criterion(out, batch, lcfg)
            scalars = {k: v for k, v in losses.items()
                       if not k.startswith("_")}
            scalars["loss"] = crit.total_loss(losses, weight_dict)
        else:
            scalars = {}
        result = {"post": post, "scalars": scalars}
        if cfg.model.masks:
            result["pred_masks"] = model.apply(
                {"params": params, **frozen}, cache, out["hs"][-1], None,
                method=model.compute_masks)
        return result

    return eval_step
