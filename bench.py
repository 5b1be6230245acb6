"""Benchmark: flagship throughput + MFU on TPU (eval forward and train step).

Prints ONE JSON line:
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
        # cannot skip them (epsilon too small to change results, not foldable).
        images = images + chain * 1e-30
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
        feats = model.apply(variables, images.astype(model.compute_dtype)
                            + chain * 1e-30, method=lambda m, x: m.backbone(x))
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


def main():
    import jax

    baseline = get_baseline()
    peak = _chip_peak_tflops(jax.devices()[0].device_kind)
    eval_img_s, eval_tf_s, comp = measure_eval()
    train_step_s, train_img_s, train_tf_s, train_ops = measure_train()
    print(json.dumps({
        "metric": "eval_images_per_sec_per_chip",
        "value": round(eval_img_s, 2),
        "unit": "img/s",
        "vs_baseline": round(eval_img_s / baseline, 2),
        "eval_tflops_per_sec": round(eval_tf_s, 2),
        "eval_mfu_pct": round(100 * eval_tf_s / peak, 2),
        "train_steps_per_sec": round(train_step_s, 3),
        "train_imgs_per_sec": round(train_img_s, 2),
        "train_tflops_per_sec": round(train_tf_s, 2),
        "train_mfu_pct": round(100 * train_tf_s / peak, 2),
        "chip_peak_bf16_tflops": peak,
        "device": jax.devices()[0].device_kind,
        "component_ms": {k: round(v, 2) for k, v in comp.items()},
        "train_top_op_categories_ms": train_ops,
    }))


if __name__ == "__main__":
    main()
