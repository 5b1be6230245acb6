"""Training / evaluation driver (the reference's main.py:277-742 equivalent).

Workflow: config -> tokenizer (HF vocab files if present, else a BPE trained on the
dataset's closed caption vocabulary) -> per-task datasets -> model -> optimizer ->
TrainState (fresh / --load warm start / --resume) -> epoch loop with per-epoch
checkpoint, eval every eval_skip epochs, best-checkpoint tracking on mean AP@0.5
(main.py:599-738).

Run:  python -m toist_tpu.main --config configs/fixture.json [--eval] [--resume P]
"""
from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict, Optional

import jax
import numpy as np

from toist_tpu.config import Config
from toist_tpu.data.batcher import (BatchIterator, BucketSpec, default_buckets,
                                    train_buckets)
from toist_tpu.data.cocotasks import TASKS, build_task_dataset
from toist_tpu.data.tokenizer import RobertaBPE
from toist_tpu.eval.evaluator import mean_ap50
from toist_tpu.models.toist import build_model
from toist_tpu.parallel import mesh as mesh_lib
from toist_tpu.parallel import tp as tp_lib
from toist_tpu.train import checkpoint as ckpt
from toist_tpu.train import engine
from toist_tpu.train.criterion import build_weight_dict
from toist_tpu.train.optim import make_optimizer
from toist_tpu.train.step import (init_train_state, make_eval_step,
                                  make_train_step, split_variables)
from toist_tpu.train.state import TrainState
from toist_tpu.utils.logging import JsonlLogger


def build_tokenizer(cfg: Config) -> RobertaBPE:
    """HF roberta-base vocab files if available (parity path), else train a BPE
    on every caption this dataset can produce (offline path)."""
    ann = cfg.data.refexp_ann_path
    vocab_json = os.path.join(ann, "vocab.json") if ann else ""
    merges_txt = os.path.join(ann, "merges.txt") if ann else ""
    if vocab_json and os.path.exists(vocab_json) and os.path.exists(merges_txt):
        return RobertaBPE.from_pretrained_files(vocab_json, merges_txt)
    corpus = [t + "something" for t in TASKS.values()]
    id2name = os.path.join(ann, "id2name.json") if ann else ""
    if id2name and os.path.exists(id2name):
        with open(id2name) as f:
            names = list(json.load(f).values())
        corpus += [t + n for t in TASKS.values() for n in names]
    return RobertaBPE.train(corpus, vocab_size=2048)


def build_all(cfg: Config, image_set_for_eval: str = "val", mesh=None):
    """Returns (tokenizer, model, train_spec, eval_spec).

    Eval uses the two-canvas 832x1344 spec (fixed short-side-800 resize);
    training uses the finer 8-canvas ladder so multiscale samples don't pad to
    the full eval canvas (batcher.train_buckets). `mesh` (the data-parallel
    mesh) lets the fused attention kernel run per-shard on multi-device
    topologies (models/toist.py setup)."""
    tokenizer = build_tokenizer(cfg)
    model = build_model(cfg.model, text_vocab_size=tokenizer.vocab_size,
                        mesh=mesh)
    common = dict(max_text_len=cfg.data.max_text_len,
                  max_boxes=cfg.data.max_boxes,
                  num_logit_cols=cfg.data.num_logit_cols,
                  with_masks=cfg.model.masks)
    eval_spec = BucketSpec(
        buckets=cfg.data.image_buckets if cfg.data.image_buckets else
        default_buckets(cfg.data.max_size, 800), **common)
    # Train canvas precedence: explicit train_image_buckets > explicit
    # image_buckets (a user pinning canvases pins BOTH phases) > the
    # multiscale ladder.
    if cfg.data.train_image_buckets:
        tb = cfg.data.train_image_buckets
    elif cfg.data.image_buckets:
        tb = cfg.data.image_buckets
    else:
        tb = train_buckets(cfg.data.max_size, cfg.data.train_scales)
    train_spec = BucketSpec(buckets=tb, **common)
    return tokenizer, model, train_spec, eval_spec


def maybe_init_distributed() -> None:
    """Multi-host rendezvous (the reference's init_distributed_mode,
    util/dist.py:205-229).

    Two modes, mirroring the reference's env-var vs auto-detect split:
      * explicit: TOIST_COORDINATOR=host:port + TOIST_NUM_PROCESSES +
        TOIST_PROCESS_ID (the reference's MASTER_ADDR/RANK/WORLD_SIZE,
        util/dist.py:208-215) — used by torch.distributed.launch-style
        launchers and the multi-process integration test;
      * auto: TOIST_DISTRIBUTED=1 lets jax.distributed.initialize detect
        TPU-pod environments; stays inert on single-host dev machines.
    Must run before any JAX backend use (device queries pin the topology)."""
    import jax

    coord = os.environ.get("TOIST_COORDINATOR")
    if coord:
        # Heartbeat default (100 s) is tuned for dedicated hosts; a loaded
        # shared machine (CI, the 1-core dev VM) can starve a worker's
        # heartbeat thread through a minutes-long XLA compile and get it
        # evicted mid-run. Overridable for genuinely flaky networks.
        hb = int(os.environ.get("TOIST_HEARTBEAT_TIMEOUT_S", "600"))
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["TOIST_NUM_PROCESSES"]),
            process_id=int(os.environ["TOIST_PROCESS_ID"]),
            heartbeat_timeout_seconds=hb)
        print(f"jax.distributed: process {jax.process_index()}/"
              f"{jax.process_count()} via {coord}", flush=True)
        return
    if os.environ.get("TOIST_DISTRIBUTED") and jax.process_count() == 1:
        try:
            jax.distributed.initialize()
        except Exception as e:  # already initialized or single-host
            print(f"jax.distributed.initialize skipped: {e}", flush=True)


def git_sha() -> str:
    """Best-effort git stamp (reference util/misc.py:19-37, main.py:294)."""
    import subprocess
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True, text=True, timeout=5).stdout.strip() or "n/a"
    except Exception:
        return "n/a"


def main(cfg: Config) -> Optional[float]:
    maybe_init_distributed()
    from toist_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache(cfg.run.compile_cache_dir)
    print(f"toist_tpu git sha: {git_sha()}", flush=True)
    mesh = mesh_lib.make_mesh(cfg.run.mesh_shape, cfg.run.mesh_axes)
    tokenizer, model, train_spec, eval_spec = build_all(cfg, mesh=mesh)
    jsonl = JsonlLogger(cfg.run.output_dir)
    # TensorBoard event files next to log.jsonl (reference main.py:593 writes
    # them into output_dir; rank-gated like its is_main_process guard).
    from toist_tpu.utils.tensorboard import SummaryWriter
    tb = SummaryWriter(cfg.run.output_dir)

    train_sets = []
    if not cfg.run.eval_only:
        train_sets = [build_task_dataset(cfg.data, t, "train", tokenizer,
                                         masks=cfg.model.masks,
                                         distillation=cfg.loss.distillation)
                      for t in cfg.data.tasks]
    val_sets = {t: build_task_dataset(cfg.data, t, "val", tokenizer,
                                      masks=cfg.model.masks)
                for t in cfg.data.tasks}

    # Batch sizes are PER data-parallel device — the reference's per-GPU
    # batch semantics (scripts/train_dete.sh: 6 GPUs x batch 6 = global 36;
    # DistributedSampler main.py:409). The global step batch is
    # train_batch_size * accum * n_data; each process's iterator contributes
    # its local-device share of rows (make_array_from_process_local_data
    # assembles the global array in parallel/mesh.shard_batch).
    n_data = mesh.shape["data"] if "data" in mesh.axis_names else 1
    if n_data % jax.process_count():
        raise ValueError(
            f"data axis ({n_data}) must be divisible by the process count "
            f"({jax.process_count()}): every process contributes an equal "
            "local slice of the global batch")
    local_dp = n_data // jax.process_count()

    train_iter = None
    if train_sets:
        # With gradient accumulation the step consumes accum * B samples and
        # applies one optimizer update, so the iterator batches (and hence
        # steps_per_epoch / the LR schedules) scale accordingly.
        train_iter = BatchIterator(
            train_sets, train_spec,
            batch_size=(cfg.optim.train_batch_size
                        * cfg.optim.grad_accum_steps * local_dp),
            seed=cfg.run.seed, shuffle=True,
            shard_id=jax.process_index(), num_shards=jax.process_count(),
            paired=cfg.loss.distillation, num_workers=cfg.data.num_workers,
            worker_mode=cfg.data.worker_mode)
        steps_per_epoch = max(1, len(train_iter))
    elif cfg.run.eval_only:
        steps_per_epoch = 1  # LR schedules are never consulted in eval-only
    else:
        raise ValueError(
            "train mode with no train datasets: set data.tasks (or run with "
            "--eval); a placeholder steps_per_epoch would silently misshape "
            "the LR schedules")
    total_steps = steps_per_epoch * cfg.optim.epochs

    optimizer = make_optimizer(cfg.optim, steps_per_epoch, total_steps,
                               frozen_detector=cfg.model.frozen_detector,
                               freeze_text_encoder=cfg.model.freeze_text_encoder)
    weight_dict = build_weight_dict(cfg.loss, cfg.model.masks,
                                    cfg.model.dec_layers)

    # A minimal sample batch for shape-complete init on a tiny canvas (a
    # full-canvas init trace costs ~90s of compile for no benefit).
    sample = _dummy_batch(eval_spec, cfg.optim.train_batch_size,
                          init_hw=(64, 64))
    state, frozen = init_train_state(model, cfg, optimizer, sample,
                                     seed=cfg.run.seed)
    if cfg.run.pretrained_backbone or cfg.run.pretrained_text:
        from toist_tpu.utils.pretrained import apply_pretrained
        new_params, frozen = apply_pretrained(cfg, state.params, frozen)
        state = state.replace(
            params=new_params,
            ema_params=jax.tree_util.tree_map(lambda x: x.copy(), new_params)
            if state.ema_params is not None else None)
    teacher_frozen = frozen
    if cfg.loss.distillation:
        from toist_tpu.train import cluster as cluster_lib
        from toist_tpu.train.step import init_variables, split_variables
        tvars = init_variables(model, sample, seed=cfg.run.seed + 1)
        tparams, teacher_frozen = split_variables(tvars)
        if cfg.run.pretrained_backbone or cfg.run.pretrained_text:
            from toist_tpu.utils.pretrained import apply_pretrained
            tparams, teacher_frozen = apply_pretrained(cfg, tparams,
                                                       teacher_frozen)
        if cfg.run.load_noun:
            tparams, teacher_frozen = ckpt.load_params(cfg.run.load_noun,
                                                       prefer_ema=True)
        bank = cluster_lib.init_bank(
            len(TASKS), cfg.loss.cluster_memory_size, cfg.loss.cluster_num,
            cfg.model.hidden_dim, seed=cfg.run.seed)
        state = state.replace(
            teacher_params=tparams,
            teacher_ema_params=jax.tree_util.tree_map(
                lambda x: x.copy(), tparams) if cfg.optim.ema else None,
            cluster_bank=bank,
            opt_state=optimizer.init({"student": state.params,
                                      "teacher": tparams}))
    elif cfg.loss.cluster:
        from toist_tpu.train import cluster as cluster_lib
        state = state.replace(cluster_bank=cluster_lib.init_bank(
            len(TASKS), cfg.loss.cluster_memory_size, cfg.loss.cluster_num,
            cfg.model.hidden_dim, seed=cfg.run.seed))

    start_epoch = cfg.run.start_epoch
    if cfg.run.resume:
        state, frozen, start_epoch = ckpt.restore(cfg.run.resume, state, frozen)
        start_epoch += 1
    elif cfg.run.load:
        loaded_params, loaded_frozen = ckpt.load_params(cfg.run.load,
                                                        prefer_ema=True)
        # Overlay: a detection checkpoint loaded into a seg model keeps the
        # fresh mask-head init (reference --frozen_weights, main.py:475-489).
        state = state.replace(params=ckpt.merge_params(state.params,
                                                       loaded_params))
        frozen = ckpt.merge_params(frozen, loaded_frozen)

    state = mesh_lib.replicate_tree(state, mesh)
    frozen = mesh_lib.replicate_tree(frozen, mesh)
    teacher_frozen = mesh_lib.replicate_tree(teacher_frozen, mesh)
    if tp_lib.has_model_axis(mesh):
        # Tensor parallelism (parallel/tp.py): attention/FFN weights of the
        # joint transformer and text encoder shard over 'model'; the train
        # step pins updated params/EMA to the same layout.
        state = state.replace(
            params=tp_lib.shard_params(state.params, mesh),
            ema_params=(tp_lib.shard_params(state.ema_params, mesh)
                        if state.ema_params is not None else None),
            teacher_params=(tp_lib.shard_params(state.teacher_params, mesh)
                            if state.teacher_params is not None else None),
            teacher_ema_params=(
                tp_lib.shard_params(state.teacher_ema_params, mesh)
                if state.teacher_ema_params is not None else None))
    if cfg.run.shard_opt_state:
        # ZeRO-1: AdamW moments sharded over 'data' instead of replicated
        # (composed with the TP 'model' axis when present).
        state = state.replace(
            opt_state=mesh_lib.shard_opt_state(state.opt_state, mesh))

    if cfg.loss.distillation:
        from toist_tpu.train.distill import (make_cluster_eval_step,
                                             make_distillation_train_step)
        train_step = make_distillation_train_step(
            model, cfg, weight_dict, optimizer, frozen, teacher_frozen,
            mesh=mesh)
    else:
        train_step = make_train_step(model, cfg, weight_dict, optimizer,
                                     frozen, with_masks=cfg.model.masks,
                                     mesh=mesh)
    def _local_tree(t):
        # Multi-process: host-sharded eval runs per-process on LOCAL devices
        # (train/engine.evaluate). Anything the eval program closes over
        # (frozen collections, the cluster bank) must therefore be local —
        # a global-mesh constant drags the whole eval computation onto the
        # global mesh, whose outputs one process cannot fetch.
        if jax.process_count() == 1:
            return t
        return jax.tree_util.tree_map(jax.device_put, jax.device_get(t))

    eval_frozen = _local_tree(frozen)
    if cfg.loss.cluster:
        from toist_tpu.train.distill import make_cluster_eval_step
        cluster_eval = make_cluster_eval_step(model, cfg, weight_dict,
                                              eval_frozen)

        def eval_step(params, batch):
            return cluster_eval(params, _local_tree(state.cluster_bank),
                                batch)
    else:
        eval_step = make_eval_step(model, cfg, weight_dict, eval_frozen,
                                   with_masks=cfg.model.masks)
    rng = jax.random.PRNGKey(cfg.run.seed)

    # Eval batch: per-device too. Multi-process eval is host-sharded (each
    # process evaluates its val slice on LOCAL devices, engine.evaluate), so
    # there the per-process batch stays valid_batch_size — the reference's
    # per-GPU eval batch (scripts/eval_dete.sh).
    eval_batch = cfg.optim.valid_batch_size * (
        n_data if jax.process_count() == 1 else 1)

    def run_eval(params, epoch: int = 0) -> float:
        results = engine.evaluate(
            eval_step, params, val_sets, eval_spec,
            batch_size=eval_batch, mesh=mesh,
            iou_types=("bbox",) if not cfg.model.masks else ("bbox", "segm"))
        m = mean_ap50(results)
        jsonl.write({"kind": "eval", "mean_ap50": m,
                     "per_task": {t: {k: v.tolist() for k, v in s.items()}
                                  for t, s in results.items()}})
        # Reference TB tags: mean + per-task AP@0.5 (main.py:697-711).
        row = {"map@0.5_bbox": m}
        for t, stats in results.items():
            row[f"{t:02d}_ap@0.5_bbox"] = float(stats["bbox"][1])
            if "segm" in stats:
                row[f"{t:02d}_ap@0.5_masks"] = float(stats["segm"][1])
        if cfg.model.masks and results:
            row["map@0.5_masks"] = float(
                np.mean([s["segm"][1] for s in results.values()
                         if "segm" in s]))
        tb.add_scalars(row, step=epoch)
        return m

    if cfg.run.eval_only:
        params = state.ema_params if (cfg.optim.ema and state.ema_params
                                      is not None) else state.params
        return run_eval(params)

    best_map = -1.0
    for epoch in range(start_epoch, cfg.optim.epochs):
        t0 = time.time()
        from toist_tpu.utils.profiling import trace
        with trace(cfg.run.profile_dir if epoch == start_epoch else None):
            state, train_stats = engine.train_one_epoch(
                train_step, state, train_iter, epoch, rng, mesh=mesh,
                jsonl=jsonl, tb=tb)
        jsonl.write({"kind": "epoch", "epoch": epoch,
                     "seconds": time.time() - t0, **train_stats})
        if cfg.run.output_dir:
            # EVERY process calls save: orbax coordinates multihost commits
            # internally (its primary host writes, others join the barrier) —
            # rank-gating the call deadlocks rank 0 on that barrier. Single
            # process this is plain rank-0 behavior.
            ckpt.save(os.path.join(cfg.run.output_dir, "checkpoint"),
                      jax.device_get(state), jax.device_get(frozen), epoch,
                      async_save=cfg.run.async_checkpoint)
        if epoch % cfg.optim.eval_skip == 0:
            params = state.ema_params if cfg.optim.ema else state.params
            m = run_eval(params, epoch=epoch)
            if m > best_map and cfg.run.output_dir:
                best_map = m
                ckpt.save(os.path.join(cfg.run.output_dir, "BEST_checkpoint"),
                          jax.device_get(state), jax.device_get(frozen),
                          epoch, async_save=cfg.run.async_checkpoint)
    ckpt.wait_for_async_saves()
    return best_map


def _dummy_batch(spec: BucketSpec, batch_size: int,
                 init_hw: Optional[tuple] = None) -> Dict[str, np.ndarray]:
    # init_hw overrides the canvas: model PARAMETER shapes are independent of
    # H/W/batch, so initialization traces at a tiny canvas compile ~10x
    # faster than the full 832x1344 one (real bucket shapes compile lazily).
    bh, bw = init_hw if init_hw is not None else spec.buckets[0]
    B, N, T, L = batch_size, spec.max_boxes, spec.max_text_len, \
        spec.num_logit_cols
    batch = {
        "images": np.zeros((B, bh, bw, 3), np.float32),
        "image_mask": np.ones((B, bh, bw), bool),
        "text_ids": np.full((B, T), 1, np.int32),
        "text_mask": np.ones((B, T), bool),
        "boxes": np.zeros((B, N, 4), np.float32),
        "labels": np.zeros((B, N), np.int64),
        "box_valid": np.zeros((B, N), bool),
        "positive_map": np.zeros((B, N, L), np.float32),
        "noun_token_spans": np.full((B, N, 2), -1, np.int32),
        "caption_noun_span": np.full((B, 2), -1, np.int32),
        "sample_valid": np.zeros((B,), bool),
        "image_id": np.zeros((B,), np.int64),
        "task_id": np.zeros((B,), np.int32),
        "orig_size": np.ones((B, 2), np.int32),
        "size": np.ones((B, 2), np.int32),
    }
    if spec.with_masks:
        from toist_tpu.data.batcher import MASK_STRIDE
        batch["gt_masks"] = np.zeros(
            (B, N, bh // MASK_STRIDE, bw // MASK_STRIDE), np.uint8)
    return batch


def parse_args(argv=None) -> Config:
    p = argparse.ArgumentParser(description="TPU-native TOIST")
    p.add_argument("--config", default=None, help="json config file")
    p.add_argument("--set", nargs="*", default=[],
                   help="overrides like optim.lr=1e-4 model.masks=true")
    p.add_argument("--eval", action="store_true")
    p.add_argument("--resume", default="")
    p.add_argument("--load", default="")
    p.add_argument("--output-dir", default="")
    args = p.parse_args(argv)

    overrides: Dict[str, dict] = {}
    for kv in args.set:
        key, val = kv.split("=", 1)
        sec, name = key.split(".", 1)
        try:
            val = json.loads(val)
        except json.JSONDecodeError:
            pass
        overrides.setdefault(sec, {})[name] = val
    run = overrides.setdefault("run", {})
    if args.eval:
        run["eval_only"] = True
    if args.resume:
        run["resume"] = args.resume
    if args.load:
        run["load"] = args.load
    if args.output_dir:
        run["output_dir"] = args.output_dir
    return Config.from_sources(args.config, overrides)


if __name__ == "__main__":
    main(parse_args())
