"""Output postprocessing to absolute-coordinate detections.

Reference: /root/reference/models/postprocessors.py — PostProcess (:18-56): score =
1 - P(no-object) from the softmax over the 256 soft-token columns, all labels forced
to category 1 (:35), boxes cxcywh -> xyxy scaled by original (unpadded) image size.
PostProcessSegm lives with the segmentation head (models/segmentation.py here).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from toist_tpu.ops import box_ops


@jax.jit
def postprocess_boxes(pred_logits: jnp.ndarray, pred_boxes: jnp.ndarray,
                      orig_sizes: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """[B,Q,C] logits, [B,Q,4] cxcywh, [B,2] (h,w) -> scores/labels/boxes [B,Q,...]."""
    prob = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)
    scores = 1.0 - prob[..., -1]
    labels = jnp.ones(scores.shape, jnp.int32)
    boxes = box_ops.box_cxcywh_to_xyxy(pred_boxes)
    h = orig_sizes[:, 0].astype(jnp.float32)
    w = orig_sizes[:, 1].astype(jnp.float32)
    scale = jnp.stack([w, h, w, h], axis=1)[:, None, :]
    return {"scores": scores, "labels": labels, "boxes": boxes * scale}
