"""Benchmark: flagship throughput + MFU on TPU (eval forward and train step).

Prints a CUMULATIVE JSON line after every completed stage — the LAST line of
stdout is always the most complete parseable artifact (a budget kill mid-run
loses at most the in-flight stage, never the whole bench; BENCH_r04 lesson).
Fields of the final line:
  metric/value/unit/vs_baseline : eval images/sec/chip for the full TOIST eval
      forward (ResNet-101 + RoBERTa-base + 6/6 cross-modal transformer +
      postprocess) at the reference's eval setting (batch 8, short-side-800
      canvas; scripts/eval_dete.sh). vs_baseline divides by a FLOPs-equivalent
      PyTorch-CPU model measured once on this machine (BENCH_BASELINE.json);
      the reference publishes no absolute numbers (BASELINE.md). North star:
      >= 4x (BASELINE.json).
  eval_tflops_per_sec / eval_mfu_pct : achieved TFLOP/s from XLA's own
      compiled cost analysis, and the fraction of the chip's bf16 peak.
  train_steps_per_sec / train_imgs_per_sec / train_tflops_per_sec /
  train_mfu_pct : the FULL jitted train step (forward, 6-level batched
      Hungarian matching, losses, backward, clip, grouped AdamW, EMA) at the
      reference's train setting (batch 6; the 832x1344 canvas — the largest
      rung of the train ladder, matching the reference's 800/1333 envelope).
  component_ms : per-iteration wall-clock of jitted sub-forwards (backbone,
      text encoder, full eval forward) — a coarse top-of-the-profile view.

NB: on this platform block_until_ready does not actually synchronize, so every
timed loop threads a data dependency through its iterations and the clock
stops only after materializing a result on the host.
"""
from __future__ import annotations

import json
import os
import time

BENCH_EVAL_BATCH = 8
BENCH_TRAIN_BATCH = 6
# Eval canvas: short side 800, long side <=1333 padded to /32 (SURVEY.md §5.7).
BENCH_H, BENCH_W = 800, 1344
TRAIN_H, TRAIN_W = 832, 1344
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_BASELINE.json")

# bf16 peak TFLOP/s by device kind substring (dense MXU peak per chip).
_PEAKS = (("v5 lite", 197.0), ("v5e", 197.0), ("v5p", 459.0),
          ("v6 lite", 918.0), ("v6e", 918.0), ("v4", 275.0), ("v3", 123.0))


def _chip_peak_tflops(kind: str) -> float:
    k = kind.lower()
    for sub, peak in _PEAKS:
        if sub in k:
            return peak
    return 197.0  # conservative default (v5e)


def _flops_of(compiled) -> float:
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def _chain_images(images, chain):
    """Data-dependent sequencing of benchmark iterations.

    Ties the iteration's compute to the previous iteration's output via
    lax.optimization_barrier: the barrier's image output cannot start before
    `chain` is ready and no simplification pass may elide it (that is the
    op's contract) — unlike the previous `images + (chain * 0).astype(u8)`
    trick, which relied on XLA not folding a float multiply-by-zero and made
    a NaN chain flow through an implementation-defined float->u8 convert.
    Exactly identity on the image values, any dtype."""
    import jax
    images, _ = jax.lax.optimization_barrier((images, chain))
    return images


def measure_eval():
    """Returns (img/s, tflops/s, component_ms) for the flagship eval forward."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__
    from toist_tpu.config import ModelConfig
    from toist_tpu.models.postprocess import postprocess_boxes
    from toist_tpu.models.toist import build_model
    from toist_tpu.train.step import init_variables

    cfg = ModelConfig()  # flagship, bf16 compute
    model = build_model(cfg, text_vocab_size=50265)
    batch = __graft_entry__._example_batch(B=BENCH_EVAL_BATCH, H=BENCH_H,
                                           W=BENCH_W)
    # Init at a tiny spatial size: parameter shapes are independent of H/W/B,
    # and the full-resolution init trace costs ~90s of compile on the tunnel.
    init_batch = __graft_entry__._example_batch(B=1, H=64, W=64)
    variables = init_variables(model, init_batch, seed=0)

    @jax.jit
    def eval_fwd(variables, images, chain, image_mask, text_ids, text_mask,
                 orig_size):
        # Chain makes successive iterations data-dependent so a lazy runtime
        # cannot skip them (dtype-preserving, not foldable).
        images = _chain_images(images, chain)
        out, _ = model.apply(variables, images, image_mask, text_ids,
                             text_mask, deterministic=True)
        post = postprocess_boxes(out["pred_logits"], out["pred_boxes"],
                                 orig_size)
        return post["scores"], post["boxes"], post["scores"][0, 0]

    images = jnp.asarray(batch["images"])
    rest = (jnp.asarray(batch["image_mask"]), jnp.asarray(batch["text_ids"]),
            jnp.asarray(batch["text_mask"]), jnp.asarray(batch["orig_size"]))
    chain = jnp.float32(0.0)
    lowered = eval_fwd.lower(variables, images, chain, *rest)
    flops = _flops_of(lowered.compile())
    scores, boxes, chain = eval_fwd(variables, images, chain, *rest)
    np.asarray(scores)
    n_iter = 20
    t0 = time.time()
    for _ in range(n_iter):
        scores, boxes, chain = eval_fwd(variables, images, chain, *rest)
    host = np.asarray(scores)
    dt = time.time() - t0
    assert np.isfinite(host).all()
    img_s = BENCH_EVAL_BATCH * n_iter / dt
    tflops_s = flops * n_iter / dt / 1e12

    # Coarse component breakdown: jitted sub-forwards, same chain trick.
    comp = {"eval_forward": dt / n_iter * 1e3}

    @jax.jit
    def backbone_fwd(variables, images, chain):
        feats = model.apply(variables,
                            _chain_images(images, chain).astype(
                                model.compute_dtype),
                            method=lambda m, x: m.backbone(x))
        out = feats["layer4"]
        return out, out.astype(jnp.float32).ravel()[0]

    @jax.jit
    def text_fwd(variables, text_ids, text_mask, chain):
        out = model.apply(
            variables, text_ids, text_mask,
            method=lambda m, ids, mask: m.text_encoder(
                ids + (chain * 0).astype(ids.dtype), key_padding_mask=mask,
                deterministic=True))
        return out, out.astype(jnp.float32).ravel()[0]

    for name, fn, args in (
            ("backbone", backbone_fwd, (variables, images)),
            ("text_encoder", text_fwd, (variables, rest[1], rest[2]))):
        ch = jnp.float32(0.0)
        _, ch = fn(*args, ch)
        np.asarray(ch)
        t0 = time.time()
        for _ in range(n_iter):
            _, ch = fn(*args, ch)
        np.asarray(ch)
        comp[name] = (time.time() - t0) / n_iter * 1e3
    return img_s, tflops_s, comp


def measure_train():
    """Returns (steps/s, img/s, tflops/s) for the FULL flagship train step."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__
    from toist_tpu.config import Config, LossConfig, ModelConfig, OptimConfig
    from toist_tpu.models.toist import build_model
    from toist_tpu.train.criterion import build_weight_dict
    from toist_tpu.train.optim import make_optimizer
    from toist_tpu.train.step import init_train_state, make_train_step

    cfg = Config(model=ModelConfig(contrastive_align_loss=True),
                 optim=OptimConfig(train_batch_size=BENCH_TRAIN_BATCH),
                 loss=LossConfig(aux_loss=True))
    model = build_model(cfg.model, text_vocab_size=50265)
    batch = __graft_entry__._example_batch(B=BENCH_TRAIN_BATCH, H=TRAIN_H,
                                           W=TRAIN_W, N=25)
    optimizer = make_optimizer(cfg.optim, steps_per_epoch=100,
                               total_steps=1000)
    # Tiny-spatial init (param shapes don't depend on H/W/B; see measure_eval).
    init_batch = __graft_entry__._example_batch(B=1, H=64, W=64, N=25)
    state, frozen = init_train_state(model, cfg, optimizer, init_batch,
                                     seed=0)
    wd = build_weight_dict(cfg.loss, masks=False,
                           num_dec_layers=cfg.model.dec_layers)
    train_step = make_train_step(model, cfg, wd, optimizer, frozen)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(0)

    # train_step is already jitted (make_train_step) — lower THAT function so
    # the cost-analysis compile and the execution share one executable
    # (wrapping it in another jax.jit compiled the step twice, ~230s each on
    # the tunnel).
    lowered = train_step.lower(state, batch, rng)
    flops = _flops_of(lowered.compile())
    state, scalars = train_step(state, batch, rng)   # warmup/compile
    np.asarray(scalars["loss"])
    n_iter = 10
    t0 = time.time()
    for _ in range(n_iter):
        # state threads the data dependency across iterations.
        state, scalars = train_step(state, batch, rng)
    loss = float(np.asarray(scalars["loss"]))
    dt = time.time() - t0
    assert np.isfinite(loss), loss

    # Profile-derived op breakdown (device time by HLO category).
    categories = None
    try:
        import shutil
        import tempfile

        from toist_tpu.utils import xprof

        tdir = tempfile.mkdtemp(prefix="toist_bench_prof_")
        with jax.profiler.trace(tdir):
            for _ in range(3):
                state, scalars = train_step(state, batch, rng)
            np.asarray(scalars["loss"])
        summary = xprof.summarize_trace(tdir, iters=3)
        categories = {name: ms for name, ms, _pct in summary["categories"][:5]}
        categories["_device_ms_per_iter"] = summary["device_ms_per_iter"]
        shutil.rmtree(tdir, ignore_errors=True)
    except Exception:
        pass
    return (n_iter / dt, BENCH_TRAIN_BATCH * n_iter / dt,
            flops * n_iter / dt / 1e12, categories)


def _profile_device_ms(run_n_steps, n: int = 3):
    """Device ms/iter from an n-step xprof trace (None if tracing fails).

    Short steps (seg: 51 ms) don't hide the ~25 ms/step host dispatch of the
    donated state on this 1-core VM + tunnel, so wall-clock throughput
    under-reports the chip; the trace-derived device time is the honest
    device-bound number and is recorded alongside."""
    try:
        import shutil
        import tempfile

        import jax

        from toist_tpu.utils import xprof

        tdir = tempfile.mkdtemp(prefix="toist_bench_prof_")
        with jax.profiler.trace(tdir):
            run_n_steps(n)
        out = xprof.summarize_trace(tdir, iters=n)["device_ms_per_iter"]
        shutil.rmtree(tdir, ignore_errors=True)
        return out
    except Exception:
        return None


def measure_seg_train(B: int = 2, layout: str = "flat"):
    """Segmentation train step: batch 2, frozen detector, no aux loss
    (reference scripts/train_seg.sh:1-12). Returns (steps/s, img/s, tflops/s,
    device_ms_per_iter, flops/step).

    layout selects model.mask_head_layout (flat | folded | folded_shifts) so
    the mask-head restructurings can be A/B'd per stage.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__
    from toist_tpu.config import Config, LossConfig, ModelConfig, OptimConfig
    from toist_tpu.models.toist import build_model
    from toist_tpu.train.criterion import build_weight_dict
    from toist_tpu.train.optim import make_optimizer
    from toist_tpu.train.step import init_train_state, make_train_step

    cfg = Config(model=ModelConfig(contrastive_align_loss=True,
                                   mask_model="smallconv", masks=True,
                                   mask_head_layout=layout,
                                   frozen_detector=True),
                 optim=OptimConfig(train_batch_size=B),
                 loss=LossConfig(aux_loss=False))
    model = build_model(cfg.model, text_vocab_size=50265)
    batch = __graft_entry__._example_batch(B=B, H=TRAIN_H, W=TRAIN_W, N=25,
                                           with_masks=True)
    optimizer = make_optimizer(cfg.optim, steps_per_epoch=100,
                               total_steps=1000,
                               frozen_detector=True)
    init_batch = __graft_entry__._example_batch(B=1, H=64, W=64, N=25,
                                                with_masks=True)
    state, frozen = init_train_state(model, cfg, optimizer, init_batch,
                                     seed=0)
    wd = build_weight_dict(cfg.loss, masks=True,
                           num_dec_layers=cfg.model.dec_layers)
    train_step = make_train_step(model, cfg, wd, optimizer, frozen,
                                 with_masks=True)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(0)
    lowered = train_step.lower(state, batch, rng)
    flops = _flops_of(lowered.compile())
    state, scalars = train_step(state, batch, rng)
    np.asarray(scalars["loss"])
    n_iter = 10
    t0 = time.time()
    for _ in range(n_iter):
        state, scalars = train_step(state, batch, rng)
    loss = float(np.asarray(scalars["loss"]))
    dt = time.time() - t0
    assert np.isfinite(loss), loss

    def run_n(n):
        nonlocal state, scalars
        for _ in range(n):
            state, scalars = train_step(state, batch, rng)
        np.asarray(scalars["loss"])

    return (n_iter / dt, B * n_iter / dt, flops * n_iter / dt / 1e12,
            _profile_device_ms(run_n), flops)


def measure_seg_eval():
    """Segmentation eval: batch 4 forward + all-query mask head + device mask
    postprocess + host RLE (reference scripts/eval_seg.sh). Returns
    (img/s end-to-end with the engine's double-buffered transfer overlap,
    img/s with synchronous postprocess, device tflops/s,
    postprocess_ms_per_batch on COCO-like blob masks, worstcase_ms on
    random-init salt-and-pepper masks, breakdown)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__
    from toist_tpu.config import Config, LossConfig, ModelConfig, OptimConfig
    from toist_tpu.models.postprocess import (finish_masks_device,
                                              postprocess_boxes,
                                              postprocess_masks_device,
                                              start_masks_device)
    from toist_tpu.models.toist import build_model
    from toist_tpu.train.step import init_variables

    B = 4
    cfg = Config(model=ModelConfig(contrastive_align_loss=True,
                                   mask_model="smallconv", masks=True))
    model = build_model(cfg.model, text_vocab_size=50265)
    batch = __graft_entry__._example_batch(B=B, H=BENCH_H, W=BENCH_W, N=25,
                                           with_masks=True)
    # COCO-realistic original sizes exercise the real device-resize matrices.
    batch["orig_size"] = np.asarray([[480, 640]] * B, np.int32)
    init_batch = __graft_entry__._example_batch(B=1, H=64, W=64, N=25,
                                                with_masks=True)
    variables = init_variables(model, init_batch, seed=0)

    @jax.jit
    def eval_fwd(variables, images, chain, image_mask, text_ids, text_mask,
                 orig_size):
        images = _chain_images(images, chain)
        out, cache = model.apply(variables, images, image_mask, text_ids,
                                 text_mask, deterministic=True)
        post = postprocess_boxes(out["pred_logits"], out["pred_boxes"],
                                 orig_size)
        masks = model.apply(variables, cache, out["hs"][-1], None,
                            method=model.compute_masks)
        return post, masks, post["scores"][0, 0]

    args = (jnp.asarray(batch["images"]), jnp.asarray(batch["image_mask"]),
            jnp.asarray(batch["text_ids"]), jnp.asarray(batch["text_mask"]),
            jnp.asarray(batch["orig_size"]))
    flops = _flops_of(eval_fwd.lower(variables, args[0], jnp.float32(0.0),
                                     *args[1:]).compile())
    chain = jnp.float32(0.0)
    post, masks, chain = eval_fwd(variables, args[0], chain, *args[1:])
    np.asarray(chain)
    # Correctness net + worst case: the full postprocess on the real model
    # outputs. Random-init logits binarize to salt-and-pepper masks (~1e5 RLE
    # runs/mask), which overstates the host RLE cost by orders of magnitude
    # vs a trained model's blob-like masks (a handful of runs per column) —
    # so this number is recorded as `worstcase`, not the headline.
    tp = time.time()
    rles = postprocess_masks_device(masks, batch["size"], batch["orig_size"],
                                    batch["sample_valid"])
    worst_ms = (time.time() - tp) * 1e3
    assert len(rles) == B and rles[0] is not None
    # Headline postprocess timing: COCO-like elliptical blob masks (1-2 runs
    # per column), same shapes/dtype so the jitted device resize is shared.
    rng = np.random.default_rng(0)
    Q, h4, w4 = masks.shape[1], masks.shape[2], masks.shape[3]
    bl = np.full((B, Q, h4, w4), -6.0, np.float32)
    yy, xx = np.mgrid[:h4, :w4]
    for b in range(B):
        for qi in range(Q):
            cy, cx = rng.uniform(0.2, 0.8) * h4, rng.uniform(0.2, 0.8) * w4
            ry, rx = rng.uniform(0.05, 0.25) * h4, rng.uniform(0.05, 0.25) * w4
            bl[b, qi][((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0] \
                = 6.0
    blob_masks = jnp.asarray(bl).astype(masks.dtype)
    n_iter = 8
    t0 = time.time()
    post_ms = 0.0
    timing_acc = {}
    for _ in range(n_iter):
        post, masks, chain = eval_fwd(variables, args[0], chain, *args[1:])
        tp = time.time()
        timings = {}
        rles = postprocess_masks_device(blob_masks, batch["size"],
                                        batch["orig_size"],
                                        batch["sample_valid"],
                                        timings=timings)
        post_ms += time.time() - tp
        for k, v in timings.items():
            timing_acc[k] = timing_acc.get(k, 0.0) + v
        assert len(rles) == B and rles[0] is not None
    np.asarray(chain)
    dt = time.time() - t0
    sync_img_s = B * n_iter / dt
    breakdown = {k: v / n_iter for k, v in timing_acc.items()}

    # Overlapped loop (what engine.evaluate actually runs): the packed-bits
    # pull of batch i is materialized only after batch i+1's forward has been
    # dispatched, so the transfer rides alongside device compute.
    pending = None
    t0 = time.time()
    for _ in range(n_iter):
        post, masks, chain = eval_fwd(variables, args[0], chain, *args[1:])
        handle = start_masks_device(blob_masks, batch["size"],
                                    batch["orig_size"],
                                    batch["sample_valid"])
        if pending is not None:
            rles = finish_masks_device(pending)
            assert len(rles) == B and rles[0] is not None
        pending = handle
    rles = finish_masks_device(pending)
    assert len(rles) == B and rles[0] is not None
    np.asarray(chain)
    dt = time.time() - t0
    return (B * n_iter / dt, sync_img_s, flops * n_iter / dt / 1e12,
            post_ms / n_iter * 1e3, worst_ms, breakdown)


def measure_dis_train(B: int = 3, accum: int = 1):
    """Noun-pronoun distillation train step: batch B x 2 paired streams
    (default 3 x 2, the reference's per-GPU setting), dual models, softkd +
    nsthl2 + cluster bank (scripts/train_dete_dis.sh). accum > 1 feeds a
    global batch of B*accum x 2 split into B-sized microbatches inside the
    step (exact-DDP-equivalent accumulation; train/step.py).
    Returns (steps/s, img/s counting both streams, tflops/s).

    No trace-derived device time here (unlike seg_train): at 170-230 ms the
    step fully hides the host dispatch, and a short profile window samples
    the data-dependent solver swing worse than the 24-step wall average
    (measured: a 6-step trace read 222.9 ms against a 182.4 ms average)."""
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

    cfg = Config(
        model=ModelConfig(contrastive_align_loss=True),
        optim=OptimConfig(train_batch_size=B, grad_accum_steps=accum),
        loss=LossConfig(aux_loss=True, distillation=True, softkd_loss=True,
                        nsthl2_loss=True, cluster=True,
                        cluster_memory_size=1024, cluster_num=3))
    model = build_model(cfg.model, text_vocab_size=50265)
    BG = B * accum  # global batch fed to the step

    def make(seed):
        b = __graft_entry__._example_batch(B=BG, H=TRAIN_H, W=TRAIN_W, N=25,
                                           seed=seed)
        b["noun_token_spans"] = np.tile(np.array([[2, 3]], np.int32),
                                        (BG, 25, 1)).reshape(BG, 25, 2)
        b["caption_noun_span"] = np.full((BG, 2), 2, np.int32)
        b["task_id"] = (np.arange(BG) % 14 + 1).astype(np.int32)
        return b

    noun, sth = make(1), make(2)
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
    batches = {"noun": {k: jnp.asarray(v) for k, v in noun.items()},
               "sth": {k: jnp.asarray(v) for k, v in sth.items()}}
    rng = jax.random.PRNGKey(0)
    lowered = dstep.lower(state, batches, rng)
    flops = _flops_of(lowered.compile())
    # XLA cost analysis counts a scan body ONCE regardless of trip count, so
    # the accumulation scan's per-update FLOPs come back ~accum-fold low
    # (first measured: 8x2 accum-2 read 17.0% "MFU" while running the exact
    # 33%-MFU microbatch executable back-to-back). Scale by the trip count;
    # the only thing genuinely executed once per update (optimizer/EMA
    # tree-map, ~10 flops/param) is <0.1% of a step, so the overcount from
    # scaling it too is noise.
    flops *= accum
    state, scalars = dstep(state, batches, rng)
    np.asarray(scalars["loss"])
    # The softkd/matching solve iteration counts are data-dependent and the
    # state evolves through the timing loop: 8-step windows swing +-15%
    # (measured A/B in COMPONENTS.md), so average over a longer window.
    n_iter = 24
    t0 = time.time()
    for _ in range(n_iter):
        state, scalars = dstep(state, batches, rng)
    loss = float(np.asarray(scalars["loss"]))
    dt = time.time() - t0
    assert np.isfinite(loss), loss
    return n_iter / dt, 2 * BG * n_iter / dt, flops * n_iter / dt / 1e12


def measure_pipeline(num_workers: int = 4, n_images: int = 240):
    """Host input-pipeline throughput on a disk-realistic dataset.

    The reference feeds 6 GPUs from 5 DataLoader worker processes doing JPEG
    decode + polygon->mask + multiscale resize (scripts/train_dete.sh,
    datasets/tdod.py:55-130). This measures the equivalent here: a synthetic
    COCO-Tasks dataset of real 480x640 JPEGs on disk (generated once, cached)
    driven through the full transform stack and `BatchIterator.epoch` —
    nothing touches the TPU, so the img/s is pure host capability. Paired
    with train_imgs_per_sec it answers "can the host feed the chip?"
    """
    import shutil
    import tempfile
    import time as _time

    from toist_tpu.config import DataConfig
    from toist_tpu.data.batcher import BatchIterator, BucketSpec, train_buckets
    from toist_tpu.data.cocotasks import build_task_dataset
    from toist_tpu.data.fixtures import fixture_captions, generate_fixture
    from toist_tpu.data.tokenizer import RobertaBPE

    cache = os.path.join(os.path.expanduser("~"), ".cache", "toist_tpu",
                         f"bench_data_{n_images}x480x640_v1")
    marker = os.path.join(cache, ".complete")
    if not os.path.exists(marker):
        shutil.rmtree(cache, ignore_errors=True)
        tmp = tempfile.mkdtemp(dir=os.path.dirname(cache) if
                               os.path.isdir(os.path.dirname(cache)) else None)
        generate_fixture(tmp, num_tasks=1, imgs_per_split=n_images,
                         img_size=(480, 640), seed=0, max_objects=6)
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        shutil.move(tmp, cache)
        open(marker, "w").close()
    tokenizer = RobertaBPE.train(fixture_captions(), vocab_size=512)
    # Warm the page cache so the first measured variant doesn't pay cold
    # disk reads the second one skips (~12MB of JPEGs).
    import glob as _glob
    for f in _glob.glob(os.path.join(cache, "train2014", "*.jpg")):
        open(f, "rb").read()
    dcfg = DataConfig(coco_path=cache,
                      refexp_ann_path=os.path.join(cache, "annotations"))
    out = {"num_workers": num_workers, "n_images": n_images,
           "image_hw": [480, 640], "host_cores": os.cpu_count()}
    # Variants: thread workers on both tasks (the default mode), plus one
    # process-worker row on detection — the mode exists for GIL-bound hosts
    # (its determinism is tested) and needs a throughput number to justify
    # itself; on this 1-core VM processes pay fork+pickle overhead with no
    # parallelism to win back, so expect thread >= process here.
    variants = [("detection", False, "thread"),
                ("segmentation", True, "thread"),
                ("detection", False, "process")]
    for label, masks, mode in variants:
        ds = build_task_dataset(dcfg, 1, "train", tokenizer, masks=masks)
        spec = BucketSpec(buckets=train_buckets(dcfg.max_size,
                                                dcfg.train_scales),
                          max_text_len=dcfg.max_text_len,
                          max_boxes=dcfg.max_boxes, with_masks=masks)
        it = BatchIterator([ds], spec, batch_size=BENCH_TRAIN_BATCH,
                           seed=0, shuffle=True, num_workers=num_workers,
                           worker_mode=mode)
        # This shared dev VM's single core varies ~1.7x across runs (measured
        # 47-82 img/s on identical code); take the best of two epochs so the
        # recorded host capability is less hostage to a slow-core sample, and
        # record both so the variance itself is visible in the artifact.
        rates = []
        for e in range(2):
            n = 0
            t0 = _time.time()
            for batch in it.epoch(e):
                n += int(batch["sample_valid"].sum())
            rates.append(n / (_time.time() - t0))
        key = label if mode == "thread" else f"{label}_{mode}_workers"
        out[f"host_imgs_per_sec_{key}"] = round(max(rates), 2)
        out[f"host_epoch_rates_{key}"] = [round(r, 2) for r in rates]
    return out


def measure_torch_cpu() -> float:
    """FLOPs-equivalent torch model (R101 + 12-layer text + 6/6 transformer)."""
    import torch
    import torch.nn as nn

    torch.set_num_threads(os.cpu_count() or 8)

    class Bottleneck(nn.Module):
        def __init__(self, cin, width, stride=1):
            super().__init__()
            cout = width * 4
            self.c1 = nn.Conv2d(cin, width, 1, bias=False)
            self.b1 = nn.BatchNorm2d(width)
            self.c2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
            self.b2 = nn.BatchNorm2d(width)
            self.c3 = nn.Conv2d(width, cout, 1, bias=False)
            self.b3 = nn.BatchNorm2d(cout)
            self.down = (nn.Conv2d(cin, cout, 1, stride, bias=False)
                         if (cin != cout or stride != 1) else None)
            self.relu = nn.ReLU(inplace=True)

        def forward(self, x):
            r = x if self.down is None else self.down(x)
            x = self.relu(self.b1(self.c1(x)))
            x = self.relu(self.b2(self.c2(x)))
            x = self.b3(self.c3(x))
            return self.relu(x + r)

    class R101(nn.Module):
        def __init__(self):
            super().__init__()
            self.stem = nn.Sequential(
                nn.Conv2d(3, 64, 7, 2, 3, bias=False), nn.BatchNorm2d(64),
                nn.ReLU(inplace=True), nn.MaxPool2d(3, 2, 1))
            blocks = []
            cin = 64
            for width, n, stride in ((64, 3, 1), (128, 4, 2), (256, 23, 2),
                                     (512, 3, 2)):
                for i in range(n):
                    blocks.append(Bottleneck(cin, width,
                                             stride if i == 0 else 1))
                    cin = width * 4
            self.blocks = nn.Sequential(*blocks)

        def forward(self, x):
            return self.blocks(self.stem(x))

    class Model(nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = R101()
            self.proj = nn.Conv2d(2048, 256, 1)
            enc = nn.TransformerEncoderLayer(256, 8, 2048, batch_first=True)
            self.encoder = nn.TransformerEncoder(enc, 6)
            dec = nn.TransformerDecoderLayer(256, 8, 2048, batch_first=True)
            self.decoder = nn.TransformerDecoder(dec, 6)
            tenc = nn.TransformerEncoderLayer(768, 12, 3072, batch_first=True)
            self.text = nn.TransformerEncoder(tenc, 12)
            self.text_embed = nn.Embedding(50265, 768)
            self.resize = nn.Linear(768, 256)
            self.queries = nn.Parameter(torch.zeros(100, 256))
            self.cls = nn.Linear(256, 256)
            self.bbox = nn.Sequential(nn.Linear(256, 256), nn.ReLU(),
                                      nn.Linear(256, 256), nn.ReLU(),
                                      nn.Linear(256, 4))

        def forward(self, img, text_ids):
            f = self.proj(self.backbone(img))
            B, C, H, W = f.shape
            toks = f.flatten(2).transpose(1, 2)
            txt = self.resize(self.text(self.text_embed(text_ids)))
            mem = self.encoder(torch.cat([toks, txt], 1))
            q = self.queries[None].expand(B, -1, -1)
            hs = self.decoder(q, mem)
            return self.cls(hs), self.bbox(hs).sigmoid()

    model = Model().eval()
    img = torch.randn(BENCH_EVAL_BATCH, 3, BENCH_H, BENCH_W)
    text = torch.randint(4, 50000, (BENCH_EVAL_BATCH, 24))
    with torch.no_grad():
        model(img[:1], text[:1])  # warmup
        n_iter = 2
        t0 = time.time()
        for _ in range(n_iter):
            model(img, text)
        dt = time.time() - t0
    return BENCH_EVAL_BATCH * n_iter / dt


def get_baseline() -> float:
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            return json.load(f)["torch_cpu_images_per_sec"]
    val = measure_torch_cpu()
    with open(BASELINE_FILE, "w") as f:
        json.dump({"torch_cpu_images_per_sec": val,
                   "batch": BENCH_EVAL_BATCH, "hw": [BENCH_H, BENCH_W]}, f)
    return val


def run_stage(stage: str):
    """Child-process entry: measure one workload, print one JSON line.

    Stages run in separate processes because the chip cannot hold several
    train-sized executables at once (16GB HBM; see CLAUDE.md), and the TPU
    admits one process at a time — the parent stays off-device."""
    global BENCH_TRAIN_BATCH
    if stage == "dis_scaling":
        # Opt-in aggregator (no jax in THIS process — each row is a child,
        # three dual-model executables would OOM the 16GB chip together):
        # sublane-alignment probe for the distillation step. The reference's
        # per-GPU 3x2 paired batch executes each stream as a padded 8 on
        # v5e (8-wide sublanes pack the batch dim), wasting ~62% of every
        # batch-dim tile in BOTH models' fwd+bwd — the same misalignment
        # that held detection at 26% MFU until batch 8/16 (train_scaling).
        # Rows: 8x2 (aligned per-step), 6x2 with accum 3 (the reference's
        # GLOBAL 18x2 batch, exact hyperparameter parity, microbatch still
        # misaligned), 8x2 with accum 2 (global 16x2, aligned microbatch at
        # near-parity global batch).
        out = {f"batch_{label}": _run_substage(f"dis_train:{B}:{accum}")
               for label, B, accum in (("8x2", 8, 1), ("6x2_accum3", 6, 3),
                                       ("8x2_accum2", 8, 2))}
        print(json.dumps(out))
        return
    import jax

    from toist_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    peak = _chip_peak_tflops(jax.devices()[0].device_kind)
    if stage == "dete_eval":
        eval_img_s, eval_tf_s, comp = measure_eval()
        out = {
            "eval_images_per_sec": round(eval_img_s, 2),
            "eval_tflops_per_sec": round(eval_tf_s, 2),
            "eval_mfu_pct": round(100 * eval_tf_s / peak, 2),
            "component_ms": {k: round(v, 2) for k, v in comp.items()},
            "device": jax.devices()[0].device_kind,
            "chip_peak_bf16_tflops": peak,
        }
    elif stage == "dete_train" or stage.startswith("dete_train:"):
        if ":" in stage:
            BENCH_TRAIN_BATCH = int(stage.split(":")[1])
        train_step_s, train_img_s, train_tf_s, train_ops = measure_train()
        out = {
            "train_steps_per_sec": round(train_step_s, 3),
            "train_imgs_per_sec": round(train_img_s, 2),
            "train_tflops_per_sec": round(train_tf_s, 2),
            "train_mfu_pct": round(100 * train_tf_s / peak, 2),
            "train_top_op_categories_ms": train_ops,
        }
    elif stage == "dete":
        # Combined alias (the pre-round-5 monolith): eval + train in one
        # process. The default matrix runs the split stages so the headline
        # lands first and a budget kill loses at most one stage.
        eval_img_s, eval_tf_s, comp = measure_eval()
        train_step_s, train_img_s, train_tf_s, train_ops = measure_train()
        out = {
            "eval_images_per_sec": round(eval_img_s, 2),
            "eval_tflops_per_sec": round(eval_tf_s, 2),
            "eval_mfu_pct": round(100 * eval_tf_s / peak, 2),
            "train_steps_per_sec": round(train_step_s, 3),
            "train_imgs_per_sec": round(train_img_s, 2),
            "train_tflops_per_sec": round(train_tf_s, 2),
            "train_mfu_pct": round(100 * train_tf_s / peak, 2),
            "component_ms": {k: round(v, 2) for k, v in comp.items()},
            "train_top_op_categories_ms": train_ops,
            "device": jax.devices()[0].device_kind,
            "chip_peak_bf16_tflops": peak,
        }
    elif stage == "seg_train" or stage.startswith("seg_train:"):
        parts = stage.split(":")
        B = int(parts[1]) if len(parts) > 1 else 2
        layout = parts[2] if len(parts) > 2 else "flat"
        s, i, tf, dev_ms, flops = measure_seg_train(B, layout)
        out = {"steps_per_sec": round(s, 3), "imgs_per_sec": round(i, 2),
               "tflops_per_sec": round(tf, 2),
               "mfu_pct": round(100 * tf / peak, 2)}
        if dev_ms:
            # Wall-clock hides ~25ms/step of host dispatch behind the short
            # device step on this 1-core VM; record the device-bound numbers.
            out["device_ms_per_iter"] = round(dev_ms, 2)
            out["device_imgs_per_sec"] = round(B * 1e3 / dev_ms, 2)
            out["device_mfu_pct"] = round(
                100 * flops / (dev_ms / 1e3) / 1e12 / peak, 2)
    elif stage == "seg_eval":
        i, i_sync, tf, post_ms, worst_ms, pbreak = measure_seg_eval()
        out = {"imgs_per_sec": round(i, 2),
               "imgs_per_sec_sync_postprocess": round(i_sync, 2),
               "tflops_per_sec": round(tf, 2),
               "mfu_pct": round(100 * tf / peak, 2),
               "mask_postprocess_ms_per_batch": round(post_ms, 1),
               "mask_postprocess_worstcase_ms_per_batch": round(worst_ms, 1),
               # device_and_transfer includes the device->host pull of the
               # packed bits, which rides the dev tunnel here (~12-25 MB/s);
               # over real PCIe the same bytes move in ~2ms (packed_mb).
               "postprocess_breakdown": {k: round(v, 2)
                                         for k, v in pbreak.items()}}
    elif stage == "dis_train":
        s, i, tf = measure_dis_train()
        out = {"steps_per_sec": round(s, 3), "imgs_per_sec": round(i, 2),
               "tflops_per_sec": round(tf, 2),
               "mfu_pct": round(100 * tf / peak, 2)}
    elif stage.startswith("dis_train:"):
        _, Bs, accums = stage.split(":")
        s, i, tf = measure_dis_train(int(Bs), int(accums))
        out = {"steps_per_sec": round(s, 3), "imgs_per_sec": round(i, 2),
               "tflops_per_sec": round(tf, 2),
               "mfu_pct": round(100 * tf / peak, 2)}
        if int(accums) > 1:
            # flops = trip-count-scaled scan-body cost analysis (see
            # measure_dis_train); the body's own analysis can differ a few %
            # from the standalone microbatch step, so img/s is the exact
            # cross-row comparable and mfu_pct the approximation here.
            out["mfu_basis"] = ("scan body flops x accum; imgs_per_sec is "
                                "the exact comparable")
    elif stage == "train_scaling":
        # Opt-in (not in the default matrix — extra train compiles):
        # batch-scaling probe behind the COMPONENTS.md envelope rows. The
        # reference's per-GPU batch 6 is sublane-misaligned on TPU (pads to
        # 8 in tiled layouts): batch 8 runs the step FASTER in absolute ms
        # than batch 6; fixed overhead amortizes further by batch >=12.
        out = {}
        for B in (8, 12, 16):
            BENCH_TRAIN_BATCH = B
            s, i, tf, cats = measure_train()
            out[f"batch_{B}"] = {
                "imgs_per_sec": round(i, 2),
                "mfu_pct": round(100 * tf / peak, 2),
                "device_ms_per_iter": (cats or {}).get("_device_ms_per_iter")}
    else:
        raise SystemExit(f"unknown stage {stage}")
    print(json.dumps(out))


def _run_substage(stage: str, timeout: float = 3000, retries: int = 1):
    """Run one stage in a child process; returns its parsed JSON or an error
    marker (with the child's stderr tail). The parent never initializes the
    TPU backend."""
    import subprocess
    import sys

    me = os.path.abspath(__file__)
    err = {}
    for _ in range(retries + 1):
        try:
            r = subprocess.run([sys.executable, me, "--stage", stage],
                               capture_output=True, text=True,
                               timeout=timeout)
            line = [ln for ln in r.stdout.strip().splitlines()
                    if ln.startswith("{")][-1]
            return json.loads(line)
        except subprocess.TimeoutExpired:
            # No retry on timeout: the cap came from the wall-clock budget,
            # and a second identical run would overrun the deadline ~2x.
            return {"error": f"stage {stage} timed out after {timeout}s"}
        except Exception as e:
            tail = ""
            try:
                tail = (r.stderr or "").strip().splitlines()[-3:]
            except Exception:
                pass
            err = {"error": f"{type(e).__name__}: {e}"[:200],
                   "stderr_tail": tail}
    return err


def main():
    """Headline-first stage order + a cumulative JSON line after EVERY stage.

    Round 4's driver run timed out mid-matrix and, because the single JSON
    line printed only after the last stage, shipped ZERO captured numbers
    (BENCH_r04.json: rc=124, parsed null). Two structural fixes:
      * after each stage completes, the full current result object is
        re-printed as one JSON line — whoever keeps only the tail of stdout
        always holds a parseable, maximally-complete artifact;
      * a wall-clock budget (TOIST_BENCH_BUDGET_S, default 1650 s) gates each
        stage on a warm-cache estimate and caps the child timeout at the
        remaining budget, so the bench exits 0 with partial results instead
        of being killed mid-stage. Stages run headline-first (dete eval ->
        dete train -> distillation parity/aligned -> seg train/eval ->
        host pipeline -> aligned-seg bonus row), so whatever gets cut is the
        least important row.
    """
    import sys

    if len(sys.argv) > 2 and sys.argv[1] == "--stage":
        run_stage(sys.argv[2])
        return
    t_start = time.time()
    deadline = t_start + float(os.environ.get("TOIST_BENCH_BUDGET_S", "1650"))
    baseline = get_baseline()
    # All five BASELINE.json workloads, one child process each (the chip
    # cannot hold several train-sized executables at once). The matrix
    # carries each train workload at BOTH the reference's hyperparameter-
    # parity batch (seg 2, dis 3x2) and the sublane-aligned batch 8 (v5e
    # packs the batch dim into 8-wide sublanes; the parity batches execute
    # as padded 8s — see COMPONENTS.md batch guidance).
    out = {"metric": "eval_images_per_sec_per_chip", "value": 0.0,
           "unit": "img/s", "vs_baseline": 0.0}
    matrix = {}
    stage_secs = {}

    def emit():
        matrix["stage_wall_seconds"] = dict(stage_secs)
        out["matrix"] = matrix
        out["bench_wall_seconds"] = round(time.time() - t_start, 1)
        print(json.dumps(out), flush=True)

    def timed(stage, est_warm_s):
        """Run one stage child unless the remaining budget can't fit its
        warm-cache estimate; cap the child timeout at the remaining budget
        so the parent always regains control in time to emit."""
        remaining = deadline - time.time()
        if remaining < est_warm_s:
            stage_secs[stage] = "skipped_budget"
            print(f"[bench] stage {stage}: skipped "
                  f"(est {est_warm_s}s > {remaining:.0f}s left)",
                  file=sys.stderr, flush=True)
            return None
        t0 = time.time()
        res = _run_substage(stage, timeout=max(90.0, remaining - 25.0))
        stage_secs[stage] = round(time.time() - t0, 1)
        print(f"[bench] stage {stage}: {stage_secs[stage]}s", file=sys.stderr,
              flush=True)
        return res

    # 1+2: the headline workload (reference scripts/eval_dete.sh /
    # train_dete.sh), eval first — it IS the metric line.
    dete_eval = timed("dete_eval", 150)
    if dete_eval and "error" not in dete_eval:
        out["value"] = dete_eval.pop("eval_images_per_sec", 0.0)
        out["vs_baseline"] = round(out["value"] / baseline, 2)
        out.update(dete_eval)
    elif dete_eval:
        matrix["dete_eval"] = dete_eval
    emit()
    dete_train = timed("dete_train", 200)
    if dete_train and "error" not in dete_train:
        out.update(dete_train)
    elif dete_train:
        matrix["dete_train"] = dete_train
    emit()
    # Detection train at the sublane/lane-aligned batch 16 — the framework's
    # peak-MFU row (round-5 fused-attention rewrite: 42.7% MFU; the batch-6
    # row above keeps the reference's per-GPU hyperparameter parity).
    # Then distillation — the paper's flagship workload — at the reference's
    # 3x2 and at the sublane-aligned 8x2 (round-4 win: 19.9 -> 33.0% MFU).
    for key, stage, est in (("dete_train_b16", "dete_train:16", 220),
                            ("dis_train", "dis_train", 260),
                            ("dis_train_b8", "dis_train:8:1", 260),
                            ("seg_train", "seg_train", 200),
                            ("seg_eval", "seg_eval", 150)):
        res = timed(stage, est)
        if res is not None:
            matrix[key] = res
        emit()
    # Host input pipeline (no TPU): feed ratios > 1 mean the host outruns
    # the chip — the step is compute-bound, not input-bound.
    if deadline - time.time() >= 120:
        pipeline = measure_pipeline()
        host_det = pipeline["host_imgs_per_sec_detection"]
        train_img_s = out.get("train_imgs_per_sec", 0.0)
        pipeline["feed_ratio_vs_train"] = (
            round(host_det / train_img_s, 2) if train_img_s else None)
        pipeline["feed_ratio_vs_eval"] = (
            round(host_det / out["value"], 2) if out["value"] else None)
        # Real TPU-VM hosts have >=112 cores vs this dev VM's 1; the
        # per-core rate extrapolates the production feed margin
        # (VERDICT r4 weak #6 — the claim should be checkable in-artifact).
        pipeline["note_feed_margin"] = (
            "rates are 1-core; production TPU-VM hosts (>=112 cores) scale "
            "the feed ~linearly with worker count until NIC/disk bounds")
        out["pipeline"] = pipeline
    else:
        stage_secs["pipeline"] = "skipped_budget"
    emit()
    # Bonus row: sublane-aligned seg train (device MFU envelope).
    res = timed("seg_train:8:flat", 160)
    if res is not None:
        matrix["seg_train_b8"] = res
    emit()


if __name__ == "__main__":
    main()
