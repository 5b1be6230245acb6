"""Batched inference / serving API (beyond the reference's eval+visualize).

The reference exposes task-oriented detection only through the training
driver's ``--eval`` path (main.py:562-594) or the single-image visualizer
(visualize.py). This module packages the same model stack behind a serving
interface: give it a checkpoint (or in-memory params) and PIL images + task
ids, get back scored boxes (and RLE masks when the model has a mask head).

TPU discipline: images are bucketed onto the static eval canvases and each
(bucket, batch) shape compiles once (the jitted forward is cached per shape);
callers can stream arbitrary image sizes without recompiles after warmup.

Example:
    predictor = Predictor.from_checkpoint("runs/dete/checkpoint", cfg)
    dets = predictor(images=[img1, img2], task_ids=[3, 3])
    dets[0]["boxes"], dets[0]["scores"]   # xyxy absolute, 1-P(noobj)
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from toist_tpu.config import Config
from toist_tpu.data.batcher import BucketSpec, collate, default_buckets
from toist_tpu.data.cocotasks import TASKS, finalize_text
from toist_tpu.data.tokenizer import RobertaBPE
from toist_tpu.data.transforms import resize, to_array_and_normalize


class Predictor:
    """Checkpointed TOIST model as a batched task-driven detector."""

    def __init__(self, model, params, frozen, tokenizer: RobertaBPE,
                 cfg: Config, score_threshold: float = 0.0):
        self.model = model
        self.params = params
        self.frozen = frozen
        self.tokenizer = tokenizer
        self.cfg = cfg
        self.score_threshold = score_threshold
        self.spec = BucketSpec(
            buckets=cfg.data.image_buckets if cfg.data.image_buckets else
            default_buckets(cfg.data.max_size, cfg.data.val_size),
            max_text_len=cfg.data.max_text_len, max_boxes=cfg.data.max_boxes,
            num_logit_cols=cfg.data.num_logit_cols,
            with_masks=cfg.model.masks)
        self._fwd_cache: Dict = {}

    # -- construction ------------------------------------------------------

    @classmethod
    def from_checkpoint(cls, path: str, cfg: Config,
                        tokenizer: Optional[RobertaBPE] = None,
                        prefer_ema: bool = True,
                        score_threshold: float = 0.0) -> "Predictor":
        from toist_tpu.main import build_tokenizer
        from toist_tpu.models.toist import build_model
        from toist_tpu.train import checkpoint as ckpt

        tokenizer = tokenizer or build_tokenizer(cfg)
        model = build_model(cfg.model, text_vocab_size=tokenizer.vocab_size)
        params, frozen = ckpt.load_params(path, prefer_ema=prefer_ema)
        return cls(model, params, frozen, tokenizer, cfg,
                   score_threshold=score_threshold)

    # -- internals ---------------------------------------------------------

    def _caption(self, task_id: int) -> str:
        # Inference uses the student's pronoun captions ("verb something",
        # reference datasets/tdod.py:66-89 caption modes).
        return TASKS[task_id] + "something"

    def _prepare(self, image, task_id: int) -> dict:
        w0, h0 = image.size
        image, _ = resize(image, None, self.cfg.data.val_size,
                          max_size=self.cfg.data.max_size)
        w, h = image.size
        if getattr(self.cfg.data, "device_normalize", False):
            from toist_tpu.data.transforms import to_array_u8
            arr, _ = to_array_u8(image, None)
        else:
            arr, _ = to_array_and_normalize(image, None)
        caption = self._caption(task_id)
        target = {"caption": caption, "tokens_positive": [],
                  "noun_tokens_positive": []}
        target = finalize_text(target, self.tokenizer,
                               num_cols=self.cfg.data.num_logit_cols,
                               max_text_len=self.cfg.data.max_text_len)
        return {
            "image": arr, "text_ids": target["text_ids"],
            "text_len": target["text_len"],
            "boxes": np.zeros((0, 4), np.float32),
            "labels": np.zeros((0,), np.int64),
            "positive_map": np.zeros((0, self.cfg.data.num_logit_cols),
                                     np.float32),
            "noun_token_spans": np.zeros((0, 2), np.int32),
            "caption_noun_span": target.get(
                "caption_noun_span", np.full(2, -1, np.int32)),
            "image_id": 0, "task_id": task_id,
            "orig_size": np.asarray([h0, w0], np.int32),
            "size": np.asarray([h, w], np.int32),
        }

    def _forward(self, batch):
        import jax
        import jax.numpy as jnp

        key = batch["images"].shape
        if key not in self._fwd_cache:
            model, frozen, masks = self.model, self.frozen, self.cfg.model.masks

            @jax.jit
            def fwd(params, images, image_mask, text_ids, text_mask,
                    orig_size):
                from toist_tpu.models.postprocess import postprocess_boxes
                out, cache = model.apply(
                    {"params": params, **frozen}, images, image_mask,
                    text_ids, text_mask, deterministic=True)
                post = postprocess_boxes(out["pred_logits"],
                                         out["pred_boxes"], orig_size)
                if masks:
                    post = dict(post)
                    post["pred_masks"] = model.apply(
                        {"params": params, **frozen}, cache, out["hs"][-1],
                        None, method=model.compute_masks)
                return post

            self._fwd_cache[key] = fwd
        import jax.numpy as jnp
        return self._fwd_cache[key](
            self.params, jnp.asarray(batch["images"]),
            jnp.asarray(batch["image_mask"]), jnp.asarray(batch["text_ids"]),
            jnp.asarray(batch["text_mask"]), jnp.asarray(batch["orig_size"]))

    # -- public API --------------------------------------------------------

    def __call__(self, images: Sequence, task_ids: Sequence[int]
                 ) -> List[Dict[str, np.ndarray]]:
        """Detect task-relevant objects. Returns one dict per input image:
        {"boxes" [K,4] xyxy absolute, "scores" [K], "labels" [K]} sorted by
        score desc, threshold-filtered; plus "masks" (RLE dicts) when the
        model has a mask head."""
        assert len(images) == len(task_ids)
        samples = [self._prepare(im, t) for im, t in zip(images, task_ids)]
        # Group by bucket, run fixed-shape batches, scatter results back.
        order: Dict[int, List[int]] = {}
        for i, s in enumerate(samples):
            h, w = s["image"].shape[:2]
            bi = self.spec.pick(h, w)
            assert bi >= 0, (h, w)
            order.setdefault(bi, []).append(i)
        results: List[Optional[dict]] = [None] * len(samples)
        for bi, idxs in order.items():
            batch = collate([samples[i] for i in idxs], self.spec, bi,
                            batch_size=len(idxs))
            post = self._forward(batch)
            scores = np.asarray(post["scores"])
            boxes = np.asarray(post["boxes"])
            masks = None
            if "pred_masks" in post:
                from toist_tpu.models.postprocess import \
                    postprocess_masks_device
                masks = postprocess_masks_device(
                    post["pred_masks"], batch["size"], batch["orig_size"],
                    batch["sample_valid"])
            for row, i in enumerate(idxs):
                sc = scores[row]
                keep = np.argsort(-sc)
                keep = keep[sc[keep] >= self.score_threshold]
                out = {"boxes": boxes[row][keep], "scores": sc[keep],
                       "labels": np.ones(len(keep), np.int32)}
                if masks is not None and masks[row] is not None:
                    out["masks"] = [masks[row][q] for q in keep]
                results[i] = out
        return results
