"""Qualitative visualization: render GT vs predicted boxes/masks to PNGs.

Reference: /root/reference/visualize.py — batch-size-1 sequential eval over the val
loader, cv2 rendering of GT and predictions above a score threshold (0.95,
visualize.py:284-459). Unlike the reference (which duplicates the whole arg parser,
a drift hazard noted in SURVEY.md §5.6), this reuses the exact Config/driver stack.

Run: python -m toist_tpu.visualize --config c.json --resume ckpt --out vis_dir
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from toist_tpu.config import Config
from toist_tpu.data.batcher import BatchIterator
from toist_tpu.data.cocotasks import build_task_dataset
from toist_tpu.main import build_all, parse_args
from toist_tpu.models.postprocess import postprocess_masks_host
from toist_tpu.ops import rle as rle_ops

_GT_COLOR = (60, 200, 60)      # green-ish (BGR)
_PRED_COLOR = (60, 60, 230)    # red-ish


def draw_box_mask(image_rgb: np.ndarray, boxes_xyxy, color, masks=None,
                  alpha: float = 0.45) -> np.ndarray:
    """Draw boxes (and optional binary masks) on an RGB uint8 image."""
    import cv2

    img = cv2.cvtColor(image_rgb, cv2.COLOR_RGB2BGR)
    if masks is not None:
        overlay = img.copy()
        for m in masks:
            overlay[m.astype(bool)] = color
        img = cv2.addWeighted(overlay, alpha, img, 1 - alpha, 0)
    for b in boxes_xyxy:
        x0, y0, x1, y1 = [int(round(v)) for v in b]
        cv2.rectangle(img, (x0, y0), (x1, y1), color, 2)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def visualize(cfg: Config, out_dir: str, score_threshold: float = 0.95,
              max_images: Optional[int] = 20) -> int:
    """Render side-by-side GT/pred images; returns number written."""
    import cv2
    import jax
    from PIL import Image

    from toist_tpu.parallel import mesh as mesh_lib
    from toist_tpu.train import checkpoint as ckpt
    from toist_tpu.train.criterion import build_weight_dict
    from toist_tpu.train.optim import make_optimizer
    from toist_tpu.train.step import (init_train_state, make_eval_step)

    os.makedirs(out_dir, exist_ok=True)
    tokenizer, model, _train_spec, spec = build_all(cfg)
    optimizer = make_optimizer(cfg.optim, 1, 1)
    sample = None
    written = 0

    weight_dict = build_weight_dict(cfg.loss, cfg.model.masks,
                                    cfg.model.dec_layers)
    state = frozen = eval_step = None

    for task in cfg.data.tasks:
        ds = build_task_dataset(cfg.data, task, "val", tokenizer,
                                masks=cfg.model.masks)
        it = BatchIterator([ds], spec, batch_size=1, shuffle=False)
        for batch in it.epoch(0):
            if state is None:
                state, frozen = init_train_state(model, cfg, optimizer, batch,
                                                 seed=cfg.run.seed)
                if cfg.run.resume:
                    state, frozen, _ = ckpt.restore(cfg.run.resume, state,
                                                    frozen)
                eval_step = make_eval_step(model, cfg, weight_dict, frozen,
                                           with_masks=cfg.model.masks)
            params = state.ema_params if (cfg.optim.ema and
                                          state.ema_params is not None) \
                else state.params
            res = eval_step(params, batch)
            post = {k: np.asarray(v) for k, v in res["post"].items()}
            if not batch["sample_valid"][0]:
                continue
            image_id = int(batch["image_id"][0])
            info = ds.coco.imgs[image_id]
            img_path = os.path.join(ds.img_dir, info["file_name"])
            pil = Image.open(img_path).convert("RGB")
            rgb = np.asarray(pil)
            oh, ow = rgb.shape[:2]

            keep = post["scores"][0] > score_threshold
            pred_boxes = post["boxes"][0][keep]
            pred_masks = None
            if cfg.model.masks and "pred_masks" in res:
                rles = postprocess_masks_host(
                    np.asarray(res["pred_masks"])[:, keep],
                    np.asarray(batch["size"]), np.asarray(batch["orig_size"]),
                    np.asarray(batch["sample_valid"]))
                if rles[0] is not None:
                    pred_masks = [rle_ops.decode(r) for r in rles[0]]

            anns = [a for a in ds.coco.img_to_anns.get(image_id, [])
                    if a.get("category_id") == 1]
            gt_boxes = [[a["bbox"][0], a["bbox"][1],
                         a["bbox"][0] + a["bbox"][2],
                         a["bbox"][1] + a["bbox"][3]] for a in anns]
            gt_masks = None
            if cfg.model.masks:
                gt_masks = [rle_ops.polygons_to_mask(a["segmentation"], oh, ow)
                            for a in anns if isinstance(a.get("segmentation"),
                                                        list)]

            gt_img = draw_box_mask(rgb.copy(), gt_boxes, _GT_COLOR, gt_masks)
            pred_img = draw_box_mask(rgb.copy(), pred_boxes, _PRED_COLOR,
                                     pred_masks)
            side = np.concatenate([gt_img, pred_img], axis=1)
            out_path = os.path.join(out_dir,
                                    f"task{task}_img{image_id}.png")
            cv2.imwrite(out_path, cv2.cvtColor(side, cv2.COLOR_RGB2BGR))
            written += 1
            if max_images and written >= max_images:
                return written
    return written


def cli():
    cfg = parse_args()
    out = cfg.run.output_dir or "visualizations"
    n = visualize(cfg, out)
    print(f"wrote {n} visualizations to {out}")


if __name__ == "__main__":
    cli()
