"""Box utilities in JAX (cxcywh<->xyxy, IoU, GIoU, masks_to_boxes).

Semantics follow the reference math at /root/reference/util/box_ops.py:11-88, re-expressed
as pure jnp functions that are safe under vmap/jit: no degeneracy asserts (the reference
asserts at box_ops.py:51-52; here degenerate boxes are the caller's responsibility and
padded boxes are masked downstream), and division guards so padded all-zero boxes produce
finite values instead of NaN.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-9


def box_cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def box_xyxy_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) * 0.5, (y0 + y1) * 0.5, x1 - x0, y1 - y0], axis=-1)


def box_area(b: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes, shape [..., 4] -> [...]."""
    return (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Pairwise IoU + union for xyxy boxes [N,4],[M,4] -> ([N,M],[N,M])."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    iou = inter / jnp.maximum(union, _EPS)
    return iou, union


def generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise GIoU for xyxy boxes [N,4],[M,4] -> [N,M].

    Reference math: util/box_ops.py:40-61 (iou - (hull - union)/hull).
    """
    iou, union = box_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    hull = wh[..., 0] * wh[..., 1]
    return iou - (hull - union) / jnp.maximum(hull, _EPS)


def masks_to_boxes(masks: jnp.ndarray) -> jnp.ndarray:
    """Bounding boxes (xyxy) around binary masks [N,H,W] -> [N,4].

    Reference: util/box_ops.py:64-88. Empty masks produce zeros.
    """
    if masks.size == 0:
        return jnp.zeros(masks.shape[:-2] + (4,), dtype=jnp.float32)
    h, w = masks.shape[-2], masks.shape[-1]
    y = jnp.arange(h, dtype=jnp.float32)[:, None]
    x = jnp.arange(w, dtype=jnp.float32)[None, :]
    m = masks.astype(jnp.float32)
    big = 1e8
    x_max = jnp.max(m * x, axis=(-2, -1))
    x_min = jnp.min(jnp.where(m > 0, x, big), axis=(-2, -1))
    y_max = jnp.max(m * y, axis=(-2, -1))
    y_min = jnp.min(jnp.where(m > 0, y, big), axis=(-2, -1))
    empty = jnp.max(m, axis=(-2, -1)) == 0
    out = jnp.stack([x_min, y_min, x_max, y_max], axis=-1)
    return jnp.where(empty[..., None], 0.0, out)
