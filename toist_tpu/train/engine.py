"""Train/eval epoch loops (the reference's engine.py, host-side orchestration).

train_one_epoch: iterate bucketed batches, run the jitted step, meter scalars,
NaN hard-stop (engine.py:82-85). evaluate: per-task loop -> TaskEvaluator ->
stats vectors + 14-task mean AP@0.5 (engine.py:253-342, main.py:581-590).
"""
from __future__ import annotations

import sys
from typing import Callable, Dict, Optional

import numpy as np

from toist_tpu.data.batcher import BatchIterator, BucketSpec
from toist_tpu.eval.evaluator import TaskEvaluator, gt_records_from_json, mean_ap50
from toist_tpu.parallel import mesh as mesh_lib
from toist_tpu.utils.logging import JsonlLogger, MetricLogger


def train_one_epoch(train_step: Callable, state, batch_iter: BatchIterator,
                    epoch: int, rng, mesh=None,
                    jsonl: Optional[JsonlLogger] = None,
                    tb=None, print_freq: int = 10):
    logger = MetricLogger(print_freq=print_freq, header=f"Epoch [{epoch}]")
    n_batches = len(batch_iter)
    # Host syncs are expensive; fetch scalars (and run the NaN guard,
    # engine.py:82-85) only every print_freq steps so the device pipeline
    # stays full between logging points.
    i = 0
    batches = mesh_lib.prefetch_to_device(batch_iter.epoch(epoch), mesh)
    for batch in logger.log_every(batches, total=n_batches):
        state, scalars = train_step(state, batch, rng)
        if i % print_freq == 0 or i == n_batches - 1:
            host = {k: float(v) for k, v in scalars.items()
                    if np.ndim(v) == 0}
            if not host.get("loss_is_finite", 1.0):
                print(f"Loss is not finite: {host}", flush=True)
                sys.exit(1)
            logger.update(**{k: v for k, v in host.items()
                             if k in ("loss", "loss_ce", "loss_bbox",
                                      "loss_giou", "grad_norm",
                                      "loss_contrastive_align",
                                      "loss_mask", "loss_dice")})
            if jsonl is not None or tb is not None:
                # Small vector scalars (e.g. per-task bank telemetry) are
                # logged as lists alongside the true scalars.
                vecs = {k: np.asarray(v).tolist() for k, v in scalars.items()
                        if np.ndim(v) == 1 and np.size(v) <= 16}
                if jsonl is not None:
                    jsonl.write({"kind": "train_step", "epoch": epoch,
                                 "step": int(state.step), **host, **vecs})
                if tb is not None:
                    # Reference tags: 'training_loss' + each weighted loss
                    # (engine.py:108-111); bank telemetry per task
                    # ('full_label_N'/'update_count_N', engine.py:190-193).
                    row = {"training_loss": host["loss"]} if "loss" in host \
                        else {}
                    row.update({k: v for k, v in host.items()
                                if k.startswith("loss_")
                                and k != "loss_is_finite"})
                    for name, tag in (("bank_update_count", "update_count"),
                                      ("bank_full", "full_label")):
                        for j, v in enumerate(vecs.get(name, [])):
                            row[f"{tag}_{j + 1}"] = v
                    tb.add_scalars(row, step=int(state.step))
        i += 1
    # Global (cross-host) epoch stats, incl. iter_time/data_time — the epoch
    # jsonl record carries the data-wait evidence (util/metrics.py:34-46).
    logger.synchronize_between_processes()
    return state, logger.summary()


def evaluate(eval_step: Callable, params, task_datasets: Dict[int, object],
             spec: BucketSpec, batch_size: int, mesh=None,
             iou_types=("bbox",), mask_postprocess: Optional[Callable] = None,
             print_freq: int = 10) -> Dict[int, Dict[str, np.ndarray]]:
    """Run per-task evaluation; returns {task_id: {'bbox': stats12, ...}}.

    The loop is double-buffered: each batch's device->host pulls (box post
    arrays and the packed mask bits) are deferred until AFTER the next
    batch's forward has been dispatched, so transfers overlap device compute
    instead of serializing with it (JAX dispatch is async; the mask pull was
    ~94% of the seg-eval batch on the tunneled dev chip). A custom
    mask_postprocess callable runs synchronously as before."""
    if "segm" in iou_types and mask_postprocess is None:
        from toist_tpu.models.postprocess import (finish_masks_device,
                                                  start_masks_device)

        def mask_start(res, b):
            # Batched MXU resize + threshold + bitpack on device; host only
            # RLE-encodes the packed bits (postprocess.py). Dispatch only —
            # the transfer is materialized in mask_finish.
            return start_masks_device(res["pred_masks"], b["size"],
                                      b["orig_size"], b["sample_valid"])

        mask_finish = finish_masks_device
    elif mask_postprocess is not None:
        def mask_start(res, b):
            return {"sync_result": mask_postprocess(res, b)}

        def mask_finish(handle):
            return handle["sync_result"]
    import jax

    if jax.process_count() > 1:
        # Host-sharded eval is per-process by design (each host evaluates its
        # slice of the val set; results merge via the ownership-keyed
        # allgather below). Pull the replicated params to host once and let
        # the jit re-place them on LOCAL devices: per-process batch counts
        # may then differ freely, and outputs are plain addressable arrays —
        # a global-mesh program here would desync when shards are uneven.
        # The re-placement happens ONCE (device arrays are reused across the
        # per-batch jit calls; numpy leaves would re-transfer every call).
        params = jax.tree_util.tree_map(jax.device_put,
                                        jax.device_get(params))

    results = {}
    for task_id, ds in task_datasets.items():
        gts = gt_records_from_json(ds.coco.dataset)
        evaluator = TaskEvaluator(gts, iou_types=iou_types)
        # Shard the val set across hosts (reference DistributedSampler on
        # dataset_val, main.py:439) so eval time scales with hosts; the
        # per-image-ownership merge in synchronize_between_processes stays as
        # the correctness net for any duplicated tail batches.
        it = BatchIterator([ds], spec, batch_size=batch_size, shuffle=False,
                           shard_id=jax.process_index(),
                           num_shards=jax.process_count())
        logger = MetricLogger(print_freq=print_freq,
                              header=f"Eval task {task_id}:")
        def _with_np(iterator):
            # One batch of device-placement lookahead: device_put dispatches
            # asynchronously, overlapping the next transfer with eval compute.
            import collections
            queue = collections.deque()
            local = jax.process_count() > 1
            for np_b in iterator:
                # Multi-process: this process's eval slice stays on LOCAL
                # devices (the mesh is a global object; a 'data'-sharded
                # global batch would make outputs non-addressable here).
                dev_b = (jax.tree_util.tree_map(jax.device_put, np_b)
                         if local else
                         mesh_lib.shard_batch(np_b, mesh) if mesh is not None
                         else np_b)
                queue.append((np_b, dev_b))
                if len(queue) >= 2:
                    yield queue.popleft()
            while queue:
                yield queue.popleft()
        def _flush(item):
            # Materialize one batch's results on host (blocks on transfers
            # that have been overlapping the next batch's forward).
            np_b, res, mask_handle = item
            post = {k: np.asarray(v) for k, v in res["post"].items()}
            masks = mask_finish(mask_handle) if mask_handle is not None \
                else None
            evaluator.update(np_b["image_id"], post["scores"],
                             post["boxes"], valid=np_b["sample_valid"],
                             masks=masks)
            if "loss" in res["scalars"]:  # absent w/ compute_eval_losses off
                logger.update(loss=float(np.asarray(res["scalars"]["loss"])))

        pending = None
        for np_batch, batch in logger.log_every(_with_np(it.epoch(0)),
                                                total=len(it)):
            res = eval_step(params, batch)
            mask_handle = mask_start(res, np_batch) \
                if "segm" in iou_types else None
            if pending is not None:
                _flush(pending)
            pending = (np_batch, res, mask_handle)
        if pending is not None:
            _flush(pending)
        logger.synchronize_between_processes()
        evaluator.synchronize_between_processes()
        results[task_id] = evaluator.summarize()
        ap50 = results[task_id]["bbox"][1]
        print(f"Task {task_id}: AP@0.5 = {ap50:.4f}", flush=True)
    print(f"Mean AP@0.5 over {len(results)} tasks: "
          f"{mean_ap50(results):.4f}", flush=True)
    return results
