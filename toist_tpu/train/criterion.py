"""Set-prediction losses, fixed-shape and fully on device.

Behavioral spec: /root/reference/models/mdetr.py:465-1021 (SetCriterion). Every ragged
structure in the reference (per-image target lists, block-stacked positive maps,
per-image matcher index tuples) becomes a padded array + validity mask here, without
changing the math (SURVEY.md §7 hard part 2):

  * loss_labels  (:488-518)  soft-token CE with eos_coef down-weighting
  * loss_boxes   (:805-825)  L1 + GIoU over matched pairs, /num_boxes
  * cardinality  (:783-803)  logging-only L1 count error
  * contrastive_align (:601-666) bidirectional InfoNCE between query and token
    projections. Divergence: padded text slots are excluded from the logsumexp —
    the reference includes its (shorter, batch-longest) padding tokens there; with a
    fixed 64-token canvas including padding would inject far more junk terms.
  * masks (:827-853) focal + dice at the fixed GT stride (reference upsamples
    predictions to the padded target size; here both sides meet at MASK_STRIDE)
  * num_boxes normalization (:996-1001): global valid-box count, min 1 — under pjit
    the batch is global so no explicit all_reduce is needed.

Inputs use the Batch layout of data/batcher.py and the MatchResult convention of
ops/matching.py (tgt2query [B, N] with -1 for invalid targets).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from toist_tpu.config import LossConfig
from toist_tpu.ops import box_ops
from toist_tpu.ops.matching import hungarian_match_levels


def _gather_queries(arr: jnp.ndarray, tgt2query: jnp.ndarray) -> jnp.ndarray:
    """arr [B, Q, ...], tgt2query [B, N] -> [B, N, ...] (index 0 for invalid)."""
    idx = jnp.clip(tgt2query, 0, arr.shape[1] - 1)
    return jnp.take_along_axis(
        arr, idx.reshape(idx.shape + (1,) * (arr.ndim - 2)), axis=1)


def matched_query_mask(tgt2query: jnp.ndarray, num_queries: int) -> jnp.ndarray:
    """[B, N] -> [B, Q] bool."""
    oh = jax.nn.one_hot(jnp.where(tgt2query >= 0, tgt2query, num_queries),
                        num_queries + 1)
    return jnp.sum(oh[..., :num_queries], axis=1) > 0


def loss_labels(pred_logits: jnp.ndarray, positive_map: jnp.ndarray,
                tgt2query: jnp.ndarray, box_valid: jnp.ndarray,
                sample_valid: jnp.ndarray, eos_coef: float,
                num_boxes: jnp.ndarray) -> jnp.ndarray:
    B, Q, L = pred_logits.shape
    logprob = jax.nn.log_softmax(pred_logits.astype(jnp.float32), axis=-1)
    # Scatter positive-map rows to their matched query slots.
    oh = jax.nn.one_hot(jnp.where(tgt2query >= 0, tgt2query, Q), Q + 1,
                        dtype=jnp.float32)[..., :Q]          # [B, N, Q]
    oh = oh * box_valid[..., None]
    matched_map = jnp.einsum("bnq,bnl->bql", oh, positive_map)
    is_matched = jnp.sum(oh, axis=1) > 0                      # [B, Q]
    noobj = jnp.zeros((L,), jnp.float32).at[L - 1].set(1.0)
    target_sim = jnp.where(is_matched[..., None], matched_map, noobj)
    ce = -jnp.sum(logprob * target_sim, axis=-1)              # [B, Q]
    w = jnp.where(is_matched, 1.0, eos_coef) * sample_valid[:, None]
    return jnp.sum(ce * w) / num_boxes


def loss_boxes(pred_boxes: jnp.ndarray, tgt_boxes: jnp.ndarray,
               tgt2query: jnp.ndarray, box_valid: jnp.ndarray,
               num_boxes: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    src = _gather_queries(pred_boxes.astype(jnp.float32), tgt2query)  # [B, N, 4]
    mask = box_valid.astype(jnp.float32)
    l1 = jnp.sum(jnp.abs(src - tgt_boxes), axis=-1) * mask
    giou = jax.vmap(box_ops.generalized_box_iou)(
        box_ops.box_cxcywh_to_xyxy(src), box_ops.box_cxcywh_to_xyxy(tgt_boxes))
    diag = jnp.diagonal(giou, axis1=-2, axis2=-1)
    lg = (1.0 - diag) * mask
    return jnp.sum(l1) / num_boxes, jnp.sum(lg) / num_boxes


def loss_cardinality(pred_logits: jnp.ndarray, box_valid: jnp.ndarray,
                     sample_valid: jnp.ndarray) -> jnp.ndarray:
    card_pred = jnp.sum(
        jnp.argmax(pred_logits, axis=-1) != pred_logits.shape[-1] - 1, axis=1)
    tgt_len = jnp.sum(box_valid, axis=1)
    err = jnp.abs(card_pred.astype(jnp.float32) - tgt_len.astype(jnp.float32))
    denom = jnp.maximum(jnp.sum(sample_valid.astype(jnp.float32)), 1.0)
    return jnp.sum(err * sample_valid) / denom


def loss_contrastive_align(proj_queries: jnp.ndarray, proj_tokens: jnp.ndarray,
                           positive_map: jnp.ndarray, tgt2query: jnp.ndarray,
                           box_valid: jnp.ndarray, text_mask: jnp.ndarray,
                           sample_valid: jnp.ndarray, temperature: float,
                           num_boxes: jnp.ndarray) -> jnp.ndarray:
    """proj_queries [B,Q,h], proj_tokens [B,T,h], positive_map [B,N,L] (L>=T)."""
    B, Q, _ = proj_queries.shape
    T = proj_tokens.shape[1]
    logits = jnp.einsum("bqh,bth->bqt", proj_queries.astype(jnp.float32),
                        proj_tokens.astype(jnp.float32)) / temperature
    # Query-token positive pairs: binarized positive-map rows scattered to queries.
    pm_bool = (positive_map[:, :, :T] > 0).astype(jnp.float32)
    oh = jax.nn.one_hot(jnp.where(tgt2query >= 0, tgt2query, Q), Q + 1,
                        dtype=jnp.float32)[..., :Q] * box_valid[..., None]
    pos = jnp.einsum("bnq,bnt->bqt", oh, pm_bool) > 0        # [B, Q, T]
    pos = pos & (~text_mask)[:, None, :] & sample_valid[:, None, None]

    neg_logits = jnp.where((~text_mask)[:, None, :], logits, -1e9)

    boxes_with_pos = jnp.any(pos, axis=2)
    pos_term = jnp.sum(jnp.where(pos, -logits, 0.0), axis=2)
    neg_term = jax.nn.logsumexp(neg_logits, axis=2)
    nb_pos = jnp.sum(pos, axis=2) + 1e-6
    box_to_token = jnp.sum(
        jnp.where(boxes_with_pos, pos_term / nb_pos + neg_term, 0.0))

    tokens_with_pos = jnp.any(pos, axis=1)
    pos_term_t = jnp.sum(jnp.where(pos, -logits, 0.0), axis=1)
    neg_term_t = jax.nn.logsumexp(logits, axis=1)  # over queries (all valid)
    nb_pos_t = jnp.sum(pos, axis=1) + 1e-6
    token_to_box = jnp.sum(
        jnp.where(tokens_with_pos, pos_term_t / nb_pos_t + neg_term_t, 0.0))

    return (box_to_token + token_to_box) / 2.0 / num_boxes


def sigmoid_focal_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                       valid: jnp.ndarray, num_boxes: jnp.ndarray,
                       alpha: float = 0.25, gamma: float = 2.0) -> jnp.ndarray:
    """Reference models/segmentation.py:294-319, masked. logits/targets [B,N,P]."""
    prob = jax.nn.sigmoid(logits)
    ce = (jnp.maximum(logits, 0) - logits * targets +
          jnp.log1p(jnp.exp(-jnp.abs(logits))))
    p_t = prob * targets + (1 - prob) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        loss = loss * (alpha * targets + (1 - alpha) * (1 - targets))
    per_box = jnp.mean(loss, axis=-1) * valid
    return jnp.sum(per_box) / num_boxes


def dice_loss(logits: jnp.ndarray, targets: jnp.ndarray, valid: jnp.ndarray,
              num_boxes: jnp.ndarray) -> jnp.ndarray:
    """Reference models/segmentation.py:276-291, masked."""
    prob = jax.nn.sigmoid(logits)
    num = 2 * jnp.sum(prob * targets, axis=-1)
    den = jnp.sum(prob, axis=-1) + jnp.sum(targets, axis=-1)
    loss = (1 - (num + 1) / (den + 1)) * valid
    return jnp.sum(loss) / num_boxes


def compute_num_boxes(box_valid: jnp.ndarray,
                      sample_valid: jnp.ndarray) -> jnp.ndarray:
    n = jnp.sum(box_valid * sample_valid[:, None])
    return jnp.maximum(n.astype(jnp.float32), 1.0)


def mask_losses(pred_masks_sel: jnp.ndarray, gt_masks: jnp.ndarray,
                box_valid: jnp.ndarray, sample_valid: jnp.ndarray,
                prefix: str = "",
                num_boxes: Optional[jnp.ndarray] = None) -> Dict[str, jnp.ndarray]:
    """Focal + dice on matched-query masks (reference mdetr.py:827-853).

    pred_masks_sel [B, N, h, w] aligned with gt_masks [B, N, h, w] (the caller
    gathered each target's matched query via compute_masks(query_idx=t2q)).
    num_boxes overrides the per-call normalizer (gradient accumulation passes
    global_num_boxes / accum_steps, the reference's cross-rank-mean semantics,
    mdetr.py:996-1001)."""
    bv = (box_valid & sample_valid[:, None])
    if num_boxes is None:
        num_boxes = compute_num_boxes(box_valid, sample_valid)
    src = pred_masks_sel.reshape(*pred_masks_sel.shape[:2], -1)
    tgt = gt_masks.astype(jnp.float32).reshape(*gt_masks.shape[:2], -1)
    v = bv.astype(jnp.float32)
    return {
        f"{prefix}loss_mask": sigmoid_focal_loss(src, tgt, v, num_boxes),
        f"{prefix}loss_dice": dice_loss(src, tgt, v, num_boxes),
    }


def set_criterion(outputs: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray],
                  cfg: LossConfig, with_masks: bool = False,
                  pred_masks: Optional[jnp.ndarray] = None,
                  prefix: str = "") -> Dict[str, jnp.ndarray]:
    """Main + aux losses for one model stream. Returns an unweighted loss dict
    keyed like the reference ("loss_ce", "loss_bbox", ..., "loss_ce_0", ...)."""
    boxes = batch["boxes"]
    pm = batch["positive_map"]
    bv = batch["box_valid"] & batch["sample_valid"][:, None]
    sv = batch["sample_valid"].astype(jnp.float32)
    # Gradient accumulation passes global_num_boxes / accum_steps here — the
    # reference's cross-rank num_boxes mean (mdetr.py:996-1001); absent, the
    # per-batch count (global under pjit) is the same thing for accum=1.
    num_boxes = batch.get("num_boxes_override")
    if num_boxes is None:
        num_boxes = compute_num_boxes(batch["box_valid"], batch["sample_valid"])

    losses: Dict[str, jnp.ndarray] = {}

    # Stack all decoder levels (aux 0..n-1, then main) and match them in ONE
    # batched solve: 6 sequential per-level solves would serialize 6
    # data-dependent while_loops (reference runs 6 scipy calls per step,
    # mdetr.py:1004-1021); one [L*B] lockstep solve pays only for the slowest
    # single matrix. Matching is not differentiated (matcher.py:39
    # @torch.no_grad; JAX cannot reverse-differentiate the solver's loops).
    has_aux = cfg.aux_loss and "aux_pred_logits" in outputs
    if has_aux:
        logits_lvl = jnp.concatenate(
            [outputs["aux_pred_logits"], outputs["pred_logits"][None]], axis=0)
        boxes_lvl = jnp.concatenate(
            [outputs["aux_pred_boxes"], outputs["pred_boxes"][None]], axis=0)
    else:
        logits_lvl = outputs["pred_logits"][None]
        boxes_lvl = outputs["pred_boxes"][None]
    t2q_lvl = hungarian_match_levels(
        jax.lax.stop_gradient(logits_lvl), jax.lax.stop_gradient(boxes_lvl),
        boxes, pm, bv,
        cost_class=cfg.set_cost_class, cost_bbox=cfg.set_cost_bbox,
        cost_giou=cfg.set_cost_giou)                           # [L, B, N]

    def one_level(logits, pboxes, proj_q, suffix, t2q):
        losses[f"{prefix}loss_ce{suffix}"] = loss_labels(
            logits, pm, t2q, bv, sv, cfg.eos_coef, num_boxes)
        lb, lg = loss_boxes(pboxes, boxes, t2q, bv, num_boxes)
        losses[f"{prefix}loss_bbox{suffix}"] = lb
        losses[f"{prefix}loss_giou{suffix}"] = lg
        losses[f"{prefix}cardinality_error{suffix}"] = jax.lax.stop_gradient(
            loss_cardinality(logits, bv, sv))
        if proj_q is not None:
            losses[f"{prefix}loss_contrastive_align{suffix}"] = \
                loss_contrastive_align(
                    proj_q, outputs["proj_tokens"], pm, t2q, bv,
                    batch["text_mask"], batch["sample_valid"],
                    cfg.temperature_NCE, num_boxes)
        losses[f"_tgt2query{suffix}" if not prefix
               else f"_{prefix}tgt2query{suffix}"] = t2q
        return t2q

    proj_q = outputs.get("proj_queries")
    t2q_main = one_level(outputs["pred_logits"], outputs["pred_boxes"], proj_q,
                         "", t2q_lvl[-1])
    if has_aux:
        n_aux = outputs["aux_pred_logits"].shape[0]
        for i in range(n_aux):
            aux_pq = (outputs["aux_proj_queries"][i]
                      if "aux_proj_queries" in outputs and proj_q is not None
                      else None)
            one_level(outputs["aux_pred_logits"][i],
                      outputs["aux_pred_boxes"][i], aux_pq, f"_{i}",
                      t2q_lvl[i])
    losses["_tgt2query" if not prefix else f"_{prefix}tgt2query"] = t2q_main
    return losses


def _binary_prob(logits: jnp.ndarray) -> jnp.ndarray:
    """Soft binary target: [P(any object), P(no-object)] (mdetr.py:555-556)."""
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.stack([jnp.sum(p[..., :-1], axis=-1), p[..., -1]], axis=-1)


def _kl2(p_tgt: jnp.ndarray, p_src: jnp.ndarray) -> jnp.ndarray:
    """KL(p_tgt || p_src) over the last (2-class) axis, eps-guarded."""
    eps = 1e-10
    return jnp.sum(
        p_tgt * (jnp.log(p_tgt + eps) - jnp.log(p_src + eps)), axis=-1)


def _softkd_per_image(noun_logits: jnp.ndarray, sth_logits: jnp.ndarray,
                      noun_boxes: jnp.ndarray, sth_boxes: jnp.ndarray,
                      t2q_noun: jnp.ndarray, t2q_sth: jnp.ndarray,
                      box_valid: jnp.ndarray,
                      sample_valid: jnp.ndarray) -> jnp.ndarray:
    """Per-image softkd loss [(sum TP KL + sum FP KL) / Q], shape [B].

    Preference distillation (reference mdetr.py:520-599). TP pairs: queries
    matched to the same target in the two streams. FP pairs: remaining queries
    re-paired by a second assignment over KL + L1 + (-GIoU) (softkd_matcher
    :520-541, unit weights). KL(teacher||student) per pair.

    The FP solve is [L*B, ~100, 100] — the largest assignment in the
    framework and strongly data-dependent (see _lsa_backend_for for the
    measured XLA-vs-Pallas A/B across real training steps, which was a wash
    here). site="softkd": TOIST_LSA_BACKEND=pallas deliberately does NOT
    reach this solve; forcing it needs the per-site syntax
    "softkd:pallas" and is unsafe under multi-device meshes.
    """
    from toist_tpu.ops.matching import solve_lsa_auto

    B, Q = noun_logits.shape[:2]
    N = t2q_noun.shape[1]
    bi_noun = jax.lax.stop_gradient(_binary_prob(noun_logits))   # [B, Q, 2]
    bi_sth = _binary_prob(sth_logits)
    bv = box_valid & sample_valid[:, None]

    # TP pairs, aligned by target slot.
    tp_noun = _gather_queries(bi_noun, t2q_noun)                 # [B, N, 2]
    tp_sth = _gather_queries(bi_sth, t2q_sth)
    tp_kl = _kl2(tp_noun, tp_sth) * bv                           # [B, N]

    # FP sets: compact unmatched queries to the front (stable), per stream.
    def compact(order_mask):
        return jnp.argsort(order_mask, axis=-1, stable=True)     # False first

    m_noun = matched_query_mask(t2q_noun, Q)                     # [B, Q]
    m_sth = matched_query_mask(t2q_sth, Q)
    ord_noun = compact(m_noun)
    ord_sth = compact(m_sth)
    fpn_bi = jnp.take_along_axis(bi_noun, ord_noun[..., None], axis=1)
    fps_bi = jnp.take_along_axis(bi_sth, ord_sth[..., None], axis=1)
    fpn_box = jnp.take_along_axis(noun_boxes.astype(jnp.float32),
                                  ord_noun[..., None], axis=1)
    fps_box = jnp.take_along_axis(sth_boxes.astype(jnp.float32),
                                  ord_sth[..., None], axis=1)
    n_fp = Q - jnp.sum(bv, axis=-1)                              # [B]

    # Cost [B, Q(sth rows), Q(noun cols)]: KL(noun||sth) + L1 + (-GIoU).
    c_kl = jnp.sum(
        fpn_bi[:, None, :, :] * (jnp.log(fpn_bi[:, None, :, :] + 1e-10) -
                                 jnp.log(fps_bi[:, :, None, :] + 1e-10)),
        axis=-1)
    c_l1 = jnp.sum(jnp.abs(fps_box[:, :, None, :] - fpn_box[:, None, :, :]),
                   axis=-1)
    c_giou = -jax.vmap(box_ops.generalized_box_iou)(
        box_ops.box_cxcywh_to_xyxy(fps_box), box_ops.box_cxcywh_to_xyxy(fpn_box))
    cost = c_kl + c_l1 + c_giou
    # Invalid (matched) columns must not be assigned to valid FP rows.
    col_invalid = jnp.arange(Q)[None, :] >= n_fp[:, None]
    cost = jnp.where(col_invalid[:, None, :], 1e6, cost)
    # stop_gradient on the INPUTS, not just the output: the integer
    # assignment is non-differentiable anyway (reference softkd_matcher is
    # @no_grad) and zero-tangent inputs let the Pallas backend run under
    # value_and_grad (pallas_call has no JVP rule).
    assign = solve_lsa_auto(jax.lax.stop_gradient(cost), n_fp,
                            site="softkd")                        # [B, Q]
    paired_noun = _gather_queries(fpn_bi, assign)                 # [B, Q, 2]
    fp_row_valid = (jnp.arange(Q)[None, :] < n_fp[:, None]) & \
        sample_valid[:, None]
    fp_kl = _kl2(paired_noun, fps_bi) * fp_row_valid

    return (jnp.sum(tp_kl, axis=-1) + jnp.sum(fp_kl, axis=-1)) / Q


def loss_softkd(noun_logits: jnp.ndarray, sth_logits: jnp.ndarray,
                noun_boxes: jnp.ndarray, sth_boxes: jnp.ndarray,
                t2q_noun: jnp.ndarray, t2q_sth: jnp.ndarray,
                box_valid: jnp.ndarray, sample_valid: jnp.ndarray) -> jnp.ndarray:
    """Softkd for one decoder level: per-image mean over valid images."""
    per_image = _softkd_per_image(noun_logits, sth_logits, noun_boxes,
                                  sth_boxes, t2q_noun, t2q_sth, box_valid,
                                  sample_valid)
    denom = jnp.maximum(jnp.sum(sample_valid), 1)
    return jnp.sum(per_image * sample_valid) / denom


def loss_softkd_levels(noun_logits: jnp.ndarray, sth_logits: jnp.ndarray,
                       noun_boxes: jnp.ndarray, sth_boxes: jnp.ndarray,
                       t2q_noun: jnp.ndarray, t2q_sth: jnp.ndarray,
                       box_valid: jnp.ndarray,
                       sample_valid: jnp.ndarray) -> jnp.ndarray:
    """All decoder levels' softkd in ONE batched FP re-pairing solve.

    Args are stacked [L, B, ...] (t2q from hungarian_match_levels); box_valid /
    sample_valid are shared [B, ...]. Returns [L] per-level losses. Folding L
    into the batch runs the 6 per-level assignment solves in lockstep instead
    of serially (same rationale as hungarian_match_levels).
    """
    L, B = noun_logits.shape[:2]
    flat = lambda x: x.reshape((L * B,) + x.shape[2:])
    tile = lambda x: jnp.broadcast_to(
        x[None], (L,) + x.shape).reshape((L * B,) + x.shape[1:])
    per_image = _softkd_per_image(
        flat(noun_logits), flat(sth_logits), flat(noun_boxes), flat(sth_boxes),
        flat(t2q_noun), flat(t2q_sth), tile(box_valid),
        tile(sample_valid)).reshape(L, B)
    denom = jnp.maximum(jnp.sum(sample_valid), 1)
    return jnp.sum(per_image * sample_valid[None, :], axis=-1) / denom


def loss_nsthl2(noun_text_memory: jnp.ndarray, sth_text_memory: jnp.ndarray,
                noun_spans: jnp.ndarray, sth_spans: jnp.ndarray,
                box_valid: jnp.ndarray, sample_valid: jnp.ndarray) -> jnp.ndarray:
    """L2 text-feature distillation (reference mdetr.py:668-781): MSE between
    the student's pooled "something" feature and the teacher's pooled noun
    feature (detached), averaged over images that have matched boxes."""
    from toist_tpu.train.cluster import pool_span_features

    bv = box_valid & sample_valid[:, None]
    pooled_noun, has_noun = pool_span_features(
        noun_text_memory.astype(jnp.float32), noun_spans, bv)
    pooled_sth, has_sth = pool_span_features(
        sth_text_memory.astype(jnp.float32), sth_spans, bv)
    ok = (jnp.sum(bv, axis=-1) > 0) & sample_valid
    mse = jnp.mean(
        (pooled_sth - jax.lax.stop_gradient(pooled_noun)) ** 2, axis=-1)
    denom = jnp.maximum(jnp.sum(ok), 1)
    return jnp.sum(mse * ok) / denom


def build_weight_dict(cfg: LossConfig, masks: bool,
                      num_dec_layers: int = 6) -> Dict[str, float]:
    """Reference models/mdetr.py:1067-1103 weight registry."""
    wd = {"loss_ce": cfg.ce_loss_coef, "loss_bbox": cfg.bbox_loss_coef,
          "loss_giou": cfg.giou_loss_coef,
          # Always registered; total_loss only sums keys the criterion
          # actually emitted, so the weight is inert when the contrastive
          # head is off (mdetr.py:1071-1074).
          "loss_contrastive_align": cfg.contrastive_align_loss_coef}
    if masks:
        wd["loss_mask"] = cfg.mask_loss_coef
        wd["loss_dice"] = cfg.dice_loss_coef
    if cfg.nsthl2_loss:
        wd["loss_nsthl2"] = cfg.nsthl2_coef
    if cfg.softkd_loss:
        wd["loss_softkd"] = cfg.softkd_coef
    if cfg.cluster:
        wd["loss_cluster_choice"] = cfg.cluster_choice_loss
        wd["loss_cluster_feature"] = cfg.cluster_feature_loss
    base = dict(wd)
    for i in range(num_dec_layers - 1):
        wd.update({f"{k}_{i}": v for k, v in base.items()})
    return wd


def total_loss(losses: Dict[str, jnp.ndarray],
               weight_dict: Dict[str, float]) -> jnp.ndarray:
    """Weighted sum over keys present in the weight dict (engine.py:72-74).

    Distillation streams use noun_/sth_ prefixes; weights are looked up on the
    unprefixed key (mdetr.py:1084-1092)."""
    tot = jnp.float32(0.0)
    for k, v in losses.items():
        if k.startswith("_") or k.endswith("_tgt2query"):
            continue
        base = k
        for p in ("noun_", "sth_"):
            if base.startswith(p):
                base = base[len(p):]
        if base in weight_dict:
            tot = tot + weight_dict[base] * v
    return tot
