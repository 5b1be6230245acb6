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


def _interp_matrix(o: int, s: int, transpose: bool = False):
    """Bilinear-interpolation matrix W with W @ v resampling length-s signals
    to length o. Matches torch ``F.interpolate(mode="bilinear",
    align_corners=False, antialias=False)`` — the reference's PostProcessSegm
    interpolation (postprocessors.py:98-104): half-pixel source centers
    computed in float32 like torch's kernels, clamped at 0, replicate border.

    Expressing the resize as two small dense matmuls (Wy @ m @ Wx) instead of
    gathers is the TPU-first form: on device it rides the MXU; on host it hits
    BLAS instead of numpy fancy-indexing (~9x faster measured).
    """
    import numpy as np

    scale = np.float32(s) / np.float32(o)
    src = np.maximum(
        (np.arange(o, dtype=np.float32) + np.float32(0.5)) * scale
        - np.float32(0.5), np.float32(0.0))
    i0 = src.astype(np.int64)
    i1 = np.minimum(i0 + 1, s - 1)
    lam = (src - i0).astype(np.float32)
    W = np.zeros((o, s), np.float32)
    W[np.arange(o), i0] += 1.0 - lam
    W[np.arange(o), i1] += lam
    return W.T if transpose else W


def _bilinear_resize_qhw(m, oh: int, ow: int):
    """Vectorized bilinear resize of [Q, h, w] -> [Q, oh, ow] (torch
    F.interpolate parity; see _interp_matrix)."""
    _, h, w = m.shape
    return _interp_matrix(oh, h) @ m @ _interp_matrix(ow, w, transpose=True)


def postprocess_masks_host(pred_masks, sizes, orig_sizes, sample_valid,
                           mask_stride: int = 4, threshold: float = 0.5):
    """Host-side PostProcessSegm fallback (reference postprocessors.py:59-109).

    pred_masks: [B, Q, h4, w4] logits at stride `mask_stride` on the padded
    canvas. Per valid sample: crop to the unpadded size, resize each query
    mask to the original image size, threshold, RLE-encode via the C++ core.

    Implementation choice (measured on the 1-core dev VM, 200 VGA masks):
    PIL's SIMD resize 0.4s vs vectorized-numpy lerp ~20s vs dense BLAS
    interp-matrix matmuls ~15s — the interpolation matrices are 2-sparse per
    row, so dense gemm does ~160x extra FLOPs and numpy gathers are slower
    still. PIL bilinear on UPSCALE (the stride-4 -> original case) uses the
    same half-pixel convention as torch F.interpolate; on rare downscales it
    antialiases where torch doesn't — knife-edge threshold pixels may differ.
    The DEVICE path (postprocess_masks_device, the default under eval) keeps
    exact torch-interpolate parity via MXU matmuls where the extra FLOPs are
    free. Returns per-sample lists of RLE dicts (None for invalid samples).
    """
    import numpy as np
    from PIL import Image

    from toist_tpu.ops import rle as rle_ops

    pred_masks = np.asarray(pred_masks, dtype=np.float32)
    # Reference thresholds sigmoid(logits) > 0.5 after interpolation
    # (postprocessors.py:104): equivalent to logits > logit(threshold).
    logit_thr = float(np.log(threshold / (1 - threshold))) \
        if 0 < threshold < 1 else 0.0
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
            img = Image.fromarray(
                np.ascontiguousarray(pred_masks[b, q, :ch, :cw]), mode="F")
            m_up = np.asarray(img.resize((ow, oh), Image.BILINEAR))
            rles.append(rle_ops.encode((m_up > logit_thr).astype(np.uint8)))
        out.append(rles)
    return out


def _interp_vectors(o: int, s: int):
    """Two-tap bilinear gather form of _interp_matrix: per output position,
    source indices (i0, i1) and weights (1-lam, lam). Same half-pixel /
    clamp / replicate-border arithmetic as torch F.interpolate."""
    import numpy as np

    scale = np.float32(s) / np.float32(o)
    src = np.maximum(
        (np.arange(o, dtype=np.float32) + np.float32(0.5)) * scale
        - np.float32(0.5), np.float32(0.0))
    i0 = src.astype(np.int32)
    i1 = np.minimum(i0 + 1, s - 1)
    lam = (src - i0).astype(np.float32)
    return i0, i1, np.float32(1.0) - lam, lam


def _device_resize_threshold(pred_masks, iy0, iy1, ly0, ly1, ix0, ix1, lx0,
                             lx1, oh_arr, ow_arr, logit_thr: float,
                             pack_bytes: int, pack_cols: int, kc: int):
    """[B,Q,h4,w4] logits x per-sample two-tap bilinear gathers -> packed
    binary masks AND their per-column RLE transitions.

    The bilinear matrices are 2-sparse per output position, so instead of
    dense MXU matmuls (~146 GFLOP at this workload's batch-4 x 100-query x
    640^2 shape, measured 170ms/batch at f32-HIGHEST) the resize runs as two
    take_along_axis + lerp passes — pure HBM-bandwidth work, ~1% of the
    FLOPs (the device-side analogue of the reference's GPU interpolate,
    postprocessors.py:98-104). iy*/ly* are [B, OH] row indices/weights,
    ix*/lx* are [B, OW]; weights are zero beyond each sample's (oh, ow) crop
    so out-of-crop pixels threshold to 0. Thresholds on device and bit-packs
    8 pixels/byte COLUMN-major (x-major: Fortran order is exactly COCO's RLE
    stream, so the host run-length encodes the packed bytes directly via
    rle_encode_packed_cm — that host stage was 2.2s/batch before). BOTH
    output axes are cropped before leaving the device: the OH axis to
    `pack_bytes` rows of 8 and the OW axis to `pack_cols` columns, so only
    ceil(max_oh/8) * max_ow bytes per mask cross the wire (shipping all
    OW=640 columns cost a 480-wide COCO image 33% extra pull bytes).

    Beyond the packed bits, COCO's uncompressed RLE is literally the list of
    column-major transition positions — so the kernel also emits, per output
    column, the first `kc` within-column transition y-positions and the true
    transition count (uint16 each). A transition at column x, row y means
    bits[y, x] != previous-stream-element, where the previous element is
    bits[y-1, x] for y>0, bits[oh-1, x-1] for y==0 (column wrap), and a
    virtual 0 before the stream start. Trained masks are blobs (~2-4
    transitions per column), so shipping [OW, kc] uint16 positions + [OW]
    uint16 counts is ~3x fewer wire bytes than the packed bits — the pull
    rides a ~12-25 MB/s tunnel on the dev chip, so bytes are the whole cost.
    A per-sample `overflow` flag (any column count > kc) tells the host to
    fall back to pulling that sample's packed bits (e.g. untrained
    salt-and-pepper masks with ~1e5 runs). oh_arr/ow_arr are [B] int32
    per-sample crop sizes (ow 0 for invalid samples).

    Returns (packed uint8 [B,Q,pack_cols,pack_bytes],
             pos uint16 [B,Q,OW,kc], cnt uint16 [B,Q,OW], overflow bool [B]).
    """
    import jax.numpy as jnp

    m = pred_masks.astype(jnp.float32)
    take = jnp.take_along_axis
    # Rows: [B,Q,h4,w4] -> [B,Q,OH,w4].
    rows = (take(m, iy0[:, None, :, None], axis=2) * ly0[:, None, :, None]
            + take(m, iy1[:, None, :, None], axis=2) * ly1[:, None, :, None])
    # Columns, emitted x-major: [B,Q,w4,OH] -> [B,Q,OW,OH].
    rows = rows.transpose(0, 1, 3, 2)
    full = (take(rows, ix0[:, None, :, None], axis=2) * lx0[:, None, :, None]
            + take(rows, ix1[:, None, :, None], axis=2)
            * lx1[:, None, :, None])
    bits = (full > logit_thr).astype(jnp.uint8)
    B, Q, OW, OH = bits.shape
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    packed = jnp.einsum("bqxok,k->bqxo",
                        bits.reshape(B, Q, OW, OH // 8, 8), weights)
    packed = packed[..., :pack_cols, :pack_bytes]

    # --- per-column transitions (bits layout is [B, Q, x=OW, y=OH]) ---
    y_valid = (jnp.arange(OH, dtype=jnp.int32)[None, :]
               < oh_arr[:, None])[:, None, None, :]        # [B,1,1,OH]
    x_valid = (jnp.arange(OW, dtype=jnp.int32)[None, :]
               < ow_arr[:, None])[:, None, :, None]        # [B,1,OW,1]
    # Previous stream element: bits[..., x, y-1] within a column; the last
    # VALID row (y = oh-1) of column x-1 at a column wrap; 0 at stream start.
    last_idx = jnp.maximum(oh_arr - 1, 0).astype(jnp.int32)
    last_row = take(bits, jnp.broadcast_to(
        last_idx[:, None, None, None], (B, Q, OW, 1)), axis=3)  # [B,Q,OW,1]
    prev_col_last = jnp.concatenate(
        [jnp.zeros((B, Q, 1, 1), bits.dtype), last_row[:, :, :-1]], axis=2)
    prev = jnp.concatenate([prev_col_last, bits[..., :-1]], axis=3)
    t = (bits != prev) & y_valid & x_valid                  # [B,Q,OW,OH]
    rank = jnp.cumsum(t.astype(jnp.int32), axis=-1)
    cnt = rank[..., -1].astype(jnp.uint16)                  # [B,Q,OW]
    iota_y = jnp.arange(OH, dtype=jnp.int32)
    pos = jnp.stack(
        [jnp.where(t & (rank == r + 1), iota_y, 0).sum(axis=-1)
         for r in range(kc)], axis=-1).astype(jnp.uint16)   # [B,Q,OW,kc]
    overflow = jnp.any(rank[..., -1] > kc, axis=(1, 2))     # [B]
    # Crop the wire tensors to the batch's max original width, like packed.
    return packed, pos[:, :, :pack_cols], cnt[:, :, :pack_cols], overflow


_DEVICE_RESIZE_JIT = None


def start_masks_device(pred_masks, sizes, orig_sizes, sample_valid,
                       mask_stride: int = 4, threshold: float = 0.5,
                       max_out_hw=(640, 640), max_col_transitions: int = 8):
    """Phase 1 of the device PostProcessSegm: dispatch the batched on-device
    resize + threshold + RLE-transition extraction (async under JAX dispatch)
    and start the device->host copy of the per-column transition tensors
    without blocking. Returns an opaque handle for finish_masks_device —
    between the two calls the caller can dispatch the NEXT batch's forward,
    so the transition pull (the dominant cost on the tunneled dev chip)
    overlaps device compute instead of serializing with it
    (train/engine.evaluate double-buffers exactly this way). Packed bits are
    also computed on device but pulled per-sample ONLY when a sample's
    per-column transition count exceeds max_col_transitions (untrained
    salt-and-pepper masks; trained blob masks have ~2-4 per column). Falls
    back to the synchronous host path (handle carries the finished result)
    if any original exceeds the canvas or the masks are already on host."""
    import time as _time

    import jax
    import numpy as np

    OH, OW = max_out_hw
    assert OH % 8 == 0
    orig_sizes = np.asarray(orig_sizes)
    # Per-axis guard: with a non-square canvas, an image taller than OH (even
    # if < OW) cannot be written into the [OH, OW] output.
    oversized = (orig_sizes.size > 0
                 and ((orig_sizes[:, 0] > OH).any()
                      or (orig_sizes[:, 1] > OW).any()))
    if oversized or not hasattr(pred_masks, "devices"):
        return {"host_result": postprocess_masks_host(
            np.asarray(pred_masks), sizes, orig_sizes, sample_valid,
            mask_stride, threshold)}
    B, Q, h4, w4 = pred_masks.shape
    iy0 = np.zeros((B, OH), np.int32)
    iy1 = np.zeros((B, OH), np.int32)
    ly0 = np.zeros((B, OH), np.float32)
    ly1 = np.zeros((B, OH), np.float32)
    ix0 = np.zeros((B, OW), np.int32)
    ix1 = np.zeros((B, OW), np.int32)
    lx0 = np.zeros((B, OW), np.float32)
    lx1 = np.zeros((B, OW), np.float32)
    oh_arr = np.ones((B,), np.int32)
    ow_arr = np.zeros((B,), np.int32)
    max_oh, max_ow = 8, 1
    for b in range(B):
        if not sample_valid[b]:
            continue
        ih, iw = int(sizes[b][0]), int(sizes[b][1])
        oh, ow = int(orig_sizes[b][0]), int(orig_sizes[b][1])
        oh_arr[b], ow_arr[b] = oh, ow
        max_oh = max(max_oh, oh)
        max_ow = max(max_ow, ow)
        ch, cw = max(1, ih // mask_stride), max(1, iw // mask_stride)
        # Positions beyond the (oh, ow) crop keep zero weights (threshold to
        # 0); source indices beyond the (ch, cw) crop are never referenced.
        iy0[b, :oh], iy1[b, :oh], ly0[b, :oh], ly1[b, :oh] = \
            _interp_vectors(oh, ch)
        ix0[b, :ow], ix1[b, :ow], lx0[b, :ow], lx1[b, :ow] = \
            _interp_vectors(ow, cw)
    logit_thr = float(np.log(threshold / (1 - threshold))) \
        if 0 < threshold < 1 else 0.0
    # Static per-batch transfer crops: only ceil(max_oh/8) bytes per column
    # and max_ow columns leave the device (COCO batches mix 480- and 640-
    # sized originals; the handful of distinct (pack_bytes, pack_cols) pairs
    # each compile once, persistently cached).
    pack_bytes = (max_oh + 7) // 8
    pack_cols = max_ow

    global _DEVICE_RESIZE_JIT
    if _DEVICE_RESIZE_JIT is None:
        _DEVICE_RESIZE_JIT = jax.jit(
            _device_resize_threshold,
            static_argnames=("logit_thr", "pack_bytes", "pack_cols", "kc"))
    t0 = _time.time()
    packed_dev, pos_dev, cnt_dev, overflow_dev = _DEVICE_RESIZE_JIT(
        pred_masks, iy0, iy1, ly0, ly1, ix0, ix1, lx0, lx1, oh_arr, ow_arr,
        logit_thr=logit_thr, pack_bytes=pack_bytes, pack_cols=pack_cols,
        kc=max_col_transitions)
    for arr in (pos_dev, cnt_dev, overflow_dev):
        try:
            arr.copy_to_host_async()
        except Exception:
            pass  # optional accelerator API; np.asarray in finish still works
    return {"packed": packed_dev, "pos": pos_dev, "cnt": cnt_dev,
            "overflow": overflow_dev, "kc": max_col_transitions,
            "oh_arr": oh_arr, "ow_arr": ow_arr,
            "orig_sizes": orig_sizes,
            "sample_valid": np.asarray(sample_valid), "Q": Q,
            "dispatch_ms": (_time.time() - t0) * 1e3}


def finish_masks_device(handle, timings=None):
    """Phase 2: materialize the per-column transition tensors on host (blocks
    on the transfer started by start_masks_device) and assemble COCO RLEs —
    the uncompressed RLE counts are exactly the diffs of the column-major
    transition positions, so the host does a numpy diff + the C++ string
    codec per mask. Samples whose masks exceeded the per-column transition
    cap pull their packed bits instead (same bits, same RLEs, more wire
    bytes). Returns per-sample lists of RLE dicts (None for invalid
    samples)."""
    import time as _time

    import numpy as np

    from toist_tpu.ops import rle as rle_ops

    if "host_result" in handle:
        return handle["host_result"]
    t0 = _time.time()
    overflow = np.asarray(handle["overflow"])
    pos = np.asarray(handle["pos"])
    cnt = np.asarray(handle["cnt"])
    transferred = pos.nbytes + cnt.nbytes + overflow.nbytes
    orig_sizes, sample_valid = handle["orig_sizes"], handle["sample_valid"]
    kc, Q = handle["kc"], handle["Q"]
    # Packed-bits fallback: device slices so only the overflowing samples'
    # bytes cross the wire — unless every valid sample overflowed (the
    # untrained salt-and-pepper regime), where one whole-array pull beats
    # B serial slice round-trips over the tunnel.
    packed = {}
    need = [b for b in range(len(sample_valid))
            if sample_valid[b] and overflow[b]]
    n_valid = int(np.asarray(sample_valid).sum())
    if need and len(need) == n_valid:
        whole = np.asarray(handle["packed"])
        transferred += whole.nbytes
        packed = {b: whole[b] for b in need}
    else:
        for b in need:
            packed[b] = np.asarray(handle["packed"][b])
            transferred += packed[b].nbytes
    t1 = _time.time()
    out = []
    for b in range(len(sample_valid)):
        if not sample_valid[b]:
            out.append(None)
            continue
        oh, ow = int(orig_sizes[b][0]), int(orig_sizes[b][1])
        if b in packed:
            out.append([rle_ops.encode_packed_cm(packed[b][q], oh, ow)
                        for q in range(Q)])
            continue
        rles = []
        n_pix = oh * ow
        xs_full = np.arange(ow, dtype=np.int64) * oh
        for q in range(Q):
            c = cnt[b, q, :ow].astype(np.int64)
            ks = np.arange(kc, dtype=np.int64)[None, :] < c[:, None]
            ys = pos[b, q, :ow][ks].astype(np.int64)
            xs = np.repeat(xs_full, c)
            trans = xs + ys
            counts = np.diff(np.concatenate(([0], trans, [n_pix])))
            rles.append(rle_ops.encode_from_counts(counts, oh, ow))
        out.append(rles)
    if timings is not None:
        timings["device_and_transfer_ms"] = \
            handle["dispatch_ms"] + (t1 - t0) * 1e3
        timings["host_rle_ms"] = (_time.time() - t1) * 1e3
        timings["packed_mb"] = transferred / 1e6
        timings["n_overflow_samples"] = int(len(packed))
    return out


def postprocess_masks_device(pred_masks, sizes, orig_sizes, sample_valid,
                             mask_stride: int = 4, threshold: float = 0.5,
                             max_out_hw=(640, 640), timings=None):
    """Device-side PostProcessSegm: batched on-device resize + threshold +
    bitpack.

    Same contract as postprocess_masks_host (reference postprocessors.py:59-109)
    but the per-query bilinear upsample runs on TPU over ALL B*Q masks at once,
    padded to a static (OH, OW) output canvas (COCO originals are <= 640 per
    side). Falls back to the host path if any original exceeds the canvas.
    Synchronous convenience wrapper over start_masks_device +
    finish_masks_device (use those directly to overlap the transfer with the
    next batch's compute, as train/engine.evaluate does).

    timings: optional dict; on return carries "device_and_transfer_ms" (jit
    dispatch through np.asarray of the packed bits — includes the
    device->host pull, which dominates on the tunneled dev chip but is ~2ms
    over real PCIe), "host_rle_ms", and "packed_mb".
    """
    handle = start_masks_device(pred_masks, sizes, orig_sizes, sample_valid,
                                mask_stride, threshold, max_out_hw)
    return finish_masks_device(handle, timings=timings)
