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


def postprocess_masks_host(pred_masks, sizes, orig_sizes, sample_valid,
                           mask_stride: int = 4, threshold: float = 0.5):
    """Host-side PostProcessSegm (reference postprocessors.py:59-109).

    pred_masks: [B, Q, h4, w4] logits at stride `mask_stride` on the padded
    canvas. Per valid sample: crop to the unpadded size, resize to the original
    image size (bilinear, like the reference's interpolate), threshold, and
    RLE-encode via the C++ core. Returns list of per-sample lists of RLE dicts
    (None for invalid samples).
    """
    import numpy as np
    from PIL import Image

    from toist_tpu.ops import rle as rle_ops

    pred_masks = np.asarray(pred_masks)
    out = []
    B, Q = pred_masks.shape[:2]
    for b in range(B):
        if not sample_valid[b]:
            out.append(None)
            continue
        ih, iw = int(sizes[b][0]), int(sizes[b][1])
        oh, ow = int(orig_sizes[b][0]), int(orig_sizes[b][1])
        ch, cw = max(1, ih // mask_stride), max(1, iw // mask_stride)
        rles = []
        for q in range(Q):
            m = pred_masks[b, q, :ch, :cw]
            img = Image.fromarray(m.astype(np.float32), mode="F")
            m_up = np.asarray(img.resize((ow, oh), Image.BILINEAR))
            # Reference thresholds sigmoid(logits) > 0.5 after interpolation
            # (postprocessors.py:104): equivalent to logits > logit(threshold).
            logit_thr = float(np.log(threshold / (1 - threshold))) \
                if 0 < threshold < 1 else 0.0
            rles.append(rle_ops.encode((m_up > logit_thr).astype(np.uint8)))
        out.append(rles)
    return out
