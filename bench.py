"""Benchmark: flagship detection-eval throughput (images/sec/chip) on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

value        = images/sec for the full TOIST eval forward (ResNet-101 +
               RoBERTa-base + 6/6 cross-modal transformer + postprocess) at the
               reference's eval setting: batch 8, val canvas (the reference
               evaluates at short-side 800 / max 1333; scripts/eval_dete.sh).
vs_baseline  = value / (PyTorch-CPU images/sec of a FLOPs-equivalent torch
               model at the same shapes). The reference publishes no absolute
               numbers (BASELINE.md), so the baseline is measured here once on
               this machine and cached in BENCH_BASELINE.json. Target: >= 4x
               (BASELINE.json north star).
"""
from __future__ import annotations

import json
import os
import sys
import time

BENCH_BATCH = 8
# Eval canvas: short side 800, long side <=1333 padded to /32 (SURVEY.md §5.7).
BENCH_H, BENCH_W = 800, 1344
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_BASELINE.json")


def measure_tpu() -> float:
    import jax

    import __graft_entry__
    from toist_tpu.config import ModelConfig
    from toist_tpu.models.toist import build_model
    from toist_tpu.models.postprocess import postprocess_boxes
    from toist_tpu.train.step import init_variables

    cfg = ModelConfig()  # flagship, bf16 compute
    model = build_model(cfg, text_vocab_size=50265)
    batch = __graft_entry__._example_batch(B=BENCH_BATCH, H=BENCH_H, W=BENCH_W)
    variables = init_variables(model, batch, seed=0)

    import numpy as np
    import jax.numpy as jnp

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
    # Warmup/compile. NB: on this platform block_until_ready does not actually
    # synchronize, so the clock stops only after materializing a result on the
    # host; no eager ops inside the loop (eager dispatch is slow here).
    chain = jnp.float32(0.0)
    scores, boxes, chain = eval_fwd(variables, images, chain, *rest)
    np.asarray(scores)
    n_iter = 20
    t0 = time.time()
    for _ in range(n_iter):
        scores, boxes, chain = eval_fwd(variables, images, chain, *rest)
    host = np.asarray(scores)
    dt = time.time() - t0
    assert np.isfinite(host).all()
    return BENCH_BATCH * n_iter / dt


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
    img = torch.randn(BENCH_BATCH, 3, BENCH_H, BENCH_W)
    text = torch.randint(4, 50000, (BENCH_BATCH, 24))
    with torch.no_grad():
        model(img[:1], text[:1])  # warmup
        n_iter = 2
        t0 = time.time()
        for _ in range(n_iter):
            model(img, text)
        dt = time.time() - t0
    return BENCH_BATCH * n_iter / dt


def get_baseline() -> float:
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            return json.load(f)["torch_cpu_images_per_sec"]
    val = measure_torch_cpu()
    with open(BASELINE_FILE, "w") as f:
        json.dump({"torch_cpu_images_per_sec": val,
                   "batch": BENCH_BATCH, "hw": [BENCH_H, BENCH_W]}, f)
    return val


def main():
    baseline = get_baseline()
    tpu = measure_tpu()
    print(json.dumps({
        "metric": "eval_images_per_sec_per_chip",
        "value": round(tpu, 2),
        "unit": "img/s",
        "vs_baseline": round(tpu / baseline, 2),
    }))


if __name__ == "__main__":
    main()
