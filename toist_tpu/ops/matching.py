"""Hungarian matching for set prediction, fully on device.

Reference semantics: /root/reference/models/matcher.py:39-87 — per-image cost matrix
C = cost_bbox * L1(cdist) + cost_class * (-softmax(logits) @ positive_map^T)
  + cost_giou * (-GIoU), solved by linear_sum_assignment with rows=queries, cols=targets.

Differences by design (SURVEY.md §7 "shape discipline"): targets are padded to a static
MAX_BOXES with a validity mask instead of ragged per-image lists; the assignment solver runs
on device (ops/lsa.py) instead of scipy on host. The solver takes rows=targets (the small
side), matching scipy's internal transpose for R<=C, so results align with the reference's
(query_idx, target_idx) pairs.

Output convention: ``tgt2query[b, t]`` = query index assigned to target t (or -1 where
``tgt_valid[b, t]`` is False). This is the inverse permutation of the reference's
(index_i, index_j) lists and is more convenient for fixed-shape gather in the losses.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from toist_tpu.ops import box_ops
from toist_tpu.ops.lsa import solve_lsa


class MatchResult(NamedTuple):
    tgt2query: jnp.ndarray   # [B, T] int32, -1 for invalid targets
    cost: jnp.ndarray        # [B, Q, T] float32 full cost matrix (for diagnostics)


def _lsa_backend_for(site: str, env: str, jax_backend: str,
                     device_count: int) -> str:
    """Backend policy for a batched [B, R, C] assignment solve.

    site: "match" (hungarian_match, R=25) | "softkd" (criterion FP
    re-pairing, R=100). env = TOIST_LSA_BACKEND:
      * "auto"/"" (default) = XLA everywhere, by measurement:
        - matching (R=25, L6xB6): XLA lockstep 2.46ms vs Pallas 2.30ms
          (scripts/bench_matching.py) — not worth the extra Mosaic lowering.
        - softkd FP re-pairing (R=100, [18,100,100]): on STANDALONE inputs
          the VMEM-resident Pallas kernel wins clearly (4.5ms vs 12.6ms
          lockstep, and a 3-step profile snapshot suggested ~60ms of
          in-step XLA whiles). But the solve is data-dependent: A/B over
          48 real training steps (v5e, repro recorded in COMPONENTS.md)
          averaged 182.6ms/step (pallas) vs 178.3ms/step (xla) with
          per-window swings of +-15% in both directions — a wash. XLA
          stays the default: no Mosaic lowering, and unlike a bare
          pallas_call (no SPMD partitioning rule) it is safe under
          multi-device meshes.
      * "xla" = XLA everywhere.
      * "pallas" = Pallas for the "match" site ONLY (the documented
        long-run opt-in for the small Hungarian solve); softkd stays on
        XLA because the A/B measured it a wash there.
      * per-site syntax "match:pallas,softkd:pallas" forces each site
        independently (unlisted sites stay on auto).
    A resolved "pallas" is downgraded to "xla" with a warning when
    device_count > 1: a bare pallas_call inside pjit has no SPMD
    partitioning rule and XLA would gather/replicate the operands around
    it. Pallas additionally requires a real single-device TPU backend;
    forcing it elsewhere is the caller's responsibility (tests use
    interpret mode).
    """
    backend = "xla"
    if ":" in env:
        per_site = dict(
            kv.split(":", 1) for kv in env.split(",") if ":" in kv)
        backend = per_site.get(site, "xla")
    elif env == "pallas":
        backend = "pallas" if site == "match" else "xla"
    elif env == "xla":
        backend = "xla"
    if backend == "pallas" and device_count > 1:
        import warnings
        warnings.warn(
            f"TOIST_LSA_BACKEND forced pallas for site '{site}' but "
            f"device_count={device_count}: bare pallas_call has no SPMD "
            "partitioning rule under pjit; falling back to xla.",
            stacklevel=3)
        backend = "xla"
    del jax_backend  # reserved for future policies
    return backend


def solve_lsa_auto(cost: jnp.ndarray, n_rows: jnp.ndarray,
                   site: str = "match") -> jnp.ndarray:
    """Batched assignment solve [B, R, C] -> [B, R] under the backend policy."""
    import os
    backend = _lsa_backend_for(
        site, os.environ.get("TOIST_LSA_BACKEND", "auto"),
        jax.default_backend(), jax.device_count())
    if backend == "pallas":
        from toist_tpu.ops.lsa_pallas import solve_lsa_batch_pallas
        return solve_lsa_batch_pallas(cost, n_rows)
    return jax.vmap(solve_lsa)(cost, n_rows)


def match_costs(pred_logits: jnp.ndarray, pred_boxes: jnp.ndarray,
                tgt_boxes: jnp.ndarray, positive_map: jnp.ndarray,
                cost_class: float, cost_bbox: float, cost_giou: float) -> jnp.ndarray:
    """Build the [B, Q, T] matching cost tensor (reference matcher.py:63-81)."""
    out_prob = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)  # [B,Q,L]
    # Soft-token class cost: -(prob . positive_map) per (query, target).
    c_class = -jnp.einsum("bql,btl->bqt", out_prob, positive_map.astype(jnp.float32))
    # L1 box cost.
    c_bbox = jnp.sum(
        jnp.abs(pred_boxes[:, :, None, :] - tgt_boxes[:, None, :, :]), axis=-1)
    # GIoU cost.
    pb = box_ops.box_cxcywh_to_xyxy(pred_boxes)
    tb = box_ops.box_cxcywh_to_xyxy(tgt_boxes)
    c_giou = -jax.vmap(box_ops.generalized_box_iou)(pb, tb)
    return (cost_bbox * c_bbox + cost_class * c_class + cost_giou * c_giou)


def hungarian_match(pred_logits: jnp.ndarray, pred_boxes: jnp.ndarray,
                    tgt_boxes: jnp.ndarray, positive_map: jnp.ndarray,
                    tgt_valid: jnp.ndarray,
                    cost_class: float = 1.0, cost_bbox: float = 5.0,
                    cost_giou: float = 2.0) -> MatchResult:
    """Match queries to (padded) targets.

    Args:
      pred_logits: [B, Q, L] raw logits (L = 256 soft-token columns).
      pred_boxes:  [B, Q, 4] cxcywh in [0,1].
      tgt_boxes:   [B, T, 4] cxcywh, zero-padded.
      positive_map:[B, T, L] soft token alignment rows, zero-padded.
      tgt_valid:   [B, T] bool.

    Returns MatchResult with tgt2query [B, T].
    """
    cost = match_costs(pred_logits, pred_boxes, tgt_boxes, positive_map,
                       cost_class, cost_bbox, cost_giou)
    n_valid = jnp.sum(tgt_valid.astype(jnp.int32), axis=-1)  # [B]

    # Compact valid targets to the front so solve_lsa's "first n rows" contract holds.
    # Within COCO-Tasks batches targets are already front-packed by the batcher, but be
    # robust to arbitrary masks: stable-sort targets by ~valid.
    order = jnp.argsort(~tgt_valid, axis=-1, stable=True)            # [B, T]
    cost_t = jnp.take_along_axis(
        jnp.swapaxes(cost, 1, 2), order[:, :, None], axis=1)          # [B, T, Q]
    # Padded target rows get zero cost rows (ignored by solver via n_rows).
    # Backend via _lsa_backend_for: at this shape (R=25) auto stays on the
    # XLA lockstep solver (2.46 vs 2.30ms; the Pallas kernel's Mosaic
    # lowering measured ~245s of extra host trace time in the round-2
    # train-step compile for a 0.16ms/step win). TOIST_LSA_BACKEND=pallas
    # forces the kernel for long runs.
    assigned = solve_lsa_auto(cost_t, n_valid)                        # [B, T]
    # Scatter back to original target order.
    tgt2query = jnp.full(tgt_valid.shape, -1, jnp.int32)
    tgt2query = jax.vmap(lambda t2q, o, a: t2q.at[o].set(a))(tgt2query, order, assigned)
    tgt2query = jnp.where(tgt_valid, tgt2query, -1)
    return MatchResult(tgt2query=tgt2query, cost=cost)


def hungarian_match_levels(pred_logits: jnp.ndarray, pred_boxes: jnp.ndarray,
                           tgt_boxes: jnp.ndarray, positive_map: jnp.ndarray,
                           tgt_valid: jnp.ndarray,
                           cost_class: float = 1.0, cost_bbox: float = 5.0,
                           cost_giou: float = 2.0) -> jnp.ndarray:
    """Match ALL decoder levels in one batched solve.

    The reference solves matching once per decoder layer per step — 6 separate
    scipy calls (models/matcher.py:82-85 via mdetr.py:1004-1021 aux loop). A
    sequential chain of 6 on-device solves would serialize 6 data-dependent
    while_loops; folding the level axis into the batch instead runs all L*B
    assignment problems in one lockstep vmapped solve, so the step pays for the
    single slowest matrix rather than 6 per-level maxima.

    Args:
      pred_logits: [L, B, Q, C] per-level raw logits (aux levels + main).
      pred_boxes:  [L, B, Q, 4] cxcywh.
      tgt_boxes / positive_map / tgt_valid: shared [B, ...] targets.

    Returns tgt2query [L, B, T] int32 (-1 for invalid targets).
    """
    L, B, Q, C = pred_logits.shape
    T = tgt_boxes.shape[1]
    flat = lambda x: x.reshape((L * B,) + x.shape[2:])
    tile = lambda x: jnp.broadcast_to(
        x[None], (L,) + x.shape).reshape((L * B,) + x.shape[1:])
    res = hungarian_match(flat(pred_logits), flat(pred_boxes),
                          tile(tgt_boxes), tile(positive_map), tile(tgt_valid),
                          cost_class=cost_class, cost_bbox=cost_bbox,
                          cost_giou=cost_giou)
    return res.tgt2query.reshape(L, B, T)


def query_is_matched(tgt2query: jnp.ndarray, num_queries: int) -> jnp.ndarray:
    """[B, T] -> [B, Q] bool: which queries got matched to some valid target."""
    B, T = tgt2query.shape
    onehot = jax.nn.one_hot(
        jnp.where(tgt2query >= 0, tgt2query, num_queries), num_queries + 1,
        dtype=jnp.int32)
    return jnp.sum(onehot[..., :num_queries], axis=1) > 0
