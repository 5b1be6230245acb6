"""Golden tests for toist_tpu.ops.box_ops against independent numpy math.

The reference math is util/box_ops.py:11-88; torchvision is unavailable in this image so
the oracle here is a from-scratch numpy implementation plus hand-computed fixtures.
"""
import numpy as np
import jax.numpy as jnp

from toist_tpu.ops import box_ops


def _np_giou(b1, b2):
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    lt = np.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = np.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = a1[:, None] + a2[None, :] - inter
    iou = inter / union
    lt2 = np.minimum(b1[:, None, :2], b2[None, :, :2])
    rb2 = np.maximum(b1[:, None, 2:], b2[None, :, 2:])
    wh2 = np.clip(rb2 - lt2, 0, None)
    hull = wh2[..., 0] * wh2[..., 1]
    return iou - (hull - union) / hull


def random_boxes(rng, n):
    xy = rng.uniform(0, 0.8, size=(n, 2))
    wh = rng.uniform(0.05, 0.2, size=(n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_cxcywh_roundtrip():
    rng = np.random.default_rng(0)
    b = random_boxes(rng, 40)
    back = np.asarray(box_ops.box_xyxy_to_cxcywh(box_ops.box_cxcywh_to_xyxy(jnp.asarray(b))))
    np.testing.assert_allclose(back, b, rtol=1e-6, atol=1e-6)


def test_convert_known_values():
    b = jnp.asarray([[0.5, 0.5, 0.2, 0.4]])
    xyxy = np.asarray(box_ops.box_cxcywh_to_xyxy(b))
    np.testing.assert_allclose(xyxy, [[0.4, 0.3, 0.6, 0.7]], atol=1e-7)


def test_iou_identity_and_disjoint():
    b = jnp.asarray([[0.0, 0.0, 1.0, 1.0], [2.0, 2.0, 3.0, 3.0]])
    iou, union = box_ops.box_iou(b, b)
    np.testing.assert_allclose(np.asarray(iou), np.eye(2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(union)[0, 0], 1.0, atol=1e-6)


def test_giou_matches_numpy_oracle():
    rng = np.random.default_rng(1)
    b1, b2 = random_boxes(rng, 37), random_boxes(rng, 21)
    ours = np.asarray(box_ops.generalized_box_iou(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(ours, _np_giou(b1, b2), rtol=1e-5, atol=1e-5)


def test_giou_known_value():
    # Two unit squares sharing an edge: iou=0, union=2, hull=2 -> giou=0.
    a = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])
    b = jnp.asarray([[1.0, 0.0, 2.0, 1.0]])
    g = np.asarray(box_ops.generalized_box_iou(a, b))
    np.testing.assert_allclose(g, [[0.0]], atol=1e-6)
    # Diagonal corner: hull=4, union=2 -> giou = 0 - 2/4 = -0.5.
    c = jnp.asarray([[1.0, 1.0, 2.0, 2.0]])
    g2 = np.asarray(box_ops.generalized_box_iou(a, c))
    np.testing.assert_allclose(g2, [[-0.5]], atol=1e-6)


def test_padded_zero_boxes_finite():
    z = jnp.zeros((3, 4))
    g = np.asarray(box_ops.generalized_box_iou(z, z))
    assert np.isfinite(g).all()


def test_masks_to_boxes():
    m = np.zeros((2, 10, 12), np.float32)
    m[0, 2:5, 3:8] = 1  # rows 2..4, cols 3..7
    out = np.asarray(box_ops.masks_to_boxes(jnp.asarray(m)))
    np.testing.assert_allclose(out[0], [3, 2, 7, 4])
    np.testing.assert_allclose(out[1], [0, 0, 0, 0])
