"""Cluster distillation memory (the reference's ClusterCriterion) as pure functions.

Reference: /root/reference/models/mdetr.py:29-312. The torch buffers become a
ClusterBank pytree threaded through the jitted step; the per-step all_gather of
(feature, task) rows (:62-66) is unnecessary under pjit because the step already sees
the global batch — updates are applied via a deterministic lax.scan in global batch
order, so replicas stay identical by construction (SURVEY.md §7 hard part 5).

Semantics kept:
  * FIFO shift-insert until full, with the reference's full-flag quirk (full set when
    update_count exceeds memory_size BEFORE the increment, :85-92)
  * when full: FIFO mode shifts; default mode replaces the L1-nearest bank row
    (:98-103 — the reference LSA over the whole batch's rows degenerates to
    per-row nearest when rows are applied sequentially; applying sequentially also
    prevents two rows replacing the same slot, matching the LSA's intent)
  * per-sample k-means to (bounded) convergence on the task's bank, warm-started
    from and writing back the stored centers (:213-234)
  * snapping: text positions in the noun/"something" span of img_memory are
    overwritten with the chosen cluster center (:170-211, :236-280, :282-312)
"""
from __future__ import annotations

from typing import Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from toist_tpu.ops.kmeans import kmeans, kmeans_predict


@flax.struct.dataclass
class ClusterBank:
    feature_bank: jnp.ndarray     # [T, M, D]
    cluster_centers: jnp.ndarray  # [T, K, D]
    update_count: jnp.ndarray     # [T] int32
    full: jnp.ndarray             # [T] bool


def init_bank(task_count: int, memory_size: int, cluster_num: int,
              feature_dim: int, seed: int = 0) -> ClusterBank:
    """Random-normal init like the reference buffers (mdetr.py:42-51)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return ClusterBank(
        feature_bank=jax.random.normal(
            k1, (task_count, memory_size, feature_dim), jnp.float32),
        cluster_centers=jax.random.normal(
            k2, (task_count, cluster_num, feature_dim), jnp.float32),
        update_count=jnp.zeros((task_count,), jnp.int32),
        full=jnp.zeros((task_count,), bool),
    )


def span_box_masks(spans: jnp.ndarray, T: int) -> jnp.ndarray:
    """Inclusive token spans [B, N, 2] -> boolean masks [B, N, T]."""
    pos = jnp.arange(T)
    beg = spans[..., 0:1]
    end = spans[..., 1:2]
    return (pos >= beg) & (pos <= end) & (beg >= 0)


def pool_span_features(text_memory: jnp.ndarray, spans: jnp.ndarray,
                       box_valid: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-image pooled feature: mean over boxes of (mean over each box's span).

    text_memory [B, T, D], spans [B, N, 2], box_valid [B, N]
    -> (pooled [B, D], has_any [B]). Mirrors mdetr.py:112-146.
    """
    B, T, D = text_memory.shape
    m = span_box_masks(spans, T).astype(text_memory.dtype)       # [B, N, T]
    cnt = jnp.sum(m, axis=-1)                                     # [B, N]
    per_box = jnp.einsum("bnt,btd->bnd", m, text_memory) / \
        jnp.maximum(cnt, 1.0)[..., None]
    ok = box_valid & (cnt > 0)
    n_ok = jnp.sum(ok, axis=-1)
    pooled = jnp.sum(per_box * ok[..., None], axis=1) / \
        jnp.maximum(n_ok, 1)[..., None]
    return pooled, n_ok > 0


def update_bank(bank: ClusterBank, features: jnp.ndarray,
                task_idx: jnp.ndarray, valid: jnp.ndarray,
                fifo: bool = False) -> ClusterBank:
    """Sequentially push [B] pooled features into their task banks."""
    M = bank.feature_bank.shape[1]

    def push(carry, inp):
        fb, count, full = carry
        feat, t, ok = inp

        def shift_insert(fb_t):
            return jnp.concatenate([fb_t[1:], feat[None]], axis=0)

        def replace_nearest(fb_t):
            d = jnp.sum(jnp.abs(fb_t - feat[None]), axis=-1)
            j = jnp.argmin(d)
            return jnp.where((jnp.arange(M) == j)[:, None], feat[None], fb_t)

        fb_t = fb[t]
        use_replace = full[t] if not fifo else jnp.bool_(False)
        new_fb_t = jax.lax.cond(use_replace, replace_nearest, shift_insert,
                                fb_t)
        new_fb_t = jnp.where(ok, new_fb_t, fb_t)
        ntasks = fb.shape[0]
        at_t = jnp.arange(ntasks) == t
        fb = jnp.where(at_t[:, None, None], new_fb_t[None], fb)
        # Reference full-flag quirk: full set when count > M BEFORE increment.
        new_full = jnp.where(at_t & ok, full | (count > M), full)
        new_count = jnp.where(at_t & ok, count + 1, count)
        return (fb, new_count, new_full), None

    (fb, count, full), _ = jax.lax.scan(
        push, (bank.feature_bank, bank.update_count, bank.full),
        (features.astype(jnp.float32), task_idx.astype(jnp.int32), valid))
    return bank.replace(feature_bank=fb, update_count=count, full=full)


def cluster_select(bank: ClusterBank, pooled: jnp.ndarray,
                   task_idx: jnp.ndarray, valid: jnp.ndarray,
                   max_iters: int = 32, tol: float = 1e-4
                   ) -> Tuple[ClusterBank, jnp.ndarray, jnp.ndarray]:
    """Per-sample k-means on the task bank; returns updated centers, the chosen
    center feature per sample [B, D], and the choice index [B].

    Sequential over the batch (reference :171-178 order), each sample
    warm-starting from the centers left by the previous one."""

    def step(centers_all, inp):
        feat, t, ok = inp
        _, new_centers = kmeans(bank.feature_bank[t], centers_all[t],
                                max_iters=max_iters, tol=tol)
        choice = kmeans_predict(feat[None], new_centers)[0]
        center_feat = new_centers[choice]
        T = centers_all.shape[0]
        centers_all = jnp.where(
            ((jnp.arange(T) == t) & ok)[:, None, None],
            new_centers[None], centers_all)
        return centers_all, (center_feat, choice)

    centers, (center_feats, choices) = jax.lax.scan(
        step, bank.cluster_centers,
        (pooled.astype(jnp.float32), task_idx.astype(jnp.int32), valid))
    return bank.replace(cluster_centers=centers), center_feats, choices


def snap_text_memory(img_memory: jnp.ndarray, text_len: int,
                     span_union: jnp.ndarray, center_feats: jnp.ndarray,
                     valid: jnp.ndarray) -> jnp.ndarray:
    """Overwrite snapped text positions of the joint memory.

    img_memory [B, S_img + T, D]; span_union [B, T] bool; center_feats [B, D].
    Returns img_memory_mod (reference :170, :244, :290)."""
    B, S, D = img_memory.shape
    T = text_len
    text = img_memory[:, S - T:]
    sel = (span_union & valid[:, None])[..., None]
    text_mod = jnp.where(sel, center_feats[:, None, :].astype(img_memory.dtype),
                         text)
    return jnp.concatenate([img_memory[:, :S - T], text_mod], axis=1)


def teacher_update_and_snap(bank: ClusterBank, cache: Dict, batch: Dict,
                            max_iters: int = 32, tol: float = 1e-4,
                            fifo: bool = False
                            ) -> Tuple[ClusterBank, jnp.ndarray, Dict]:
    """Teacher path (update_memory, :105-211): pool noun spans, push to bank,
    k-means-snap the noun positions. Returns (bank, img_memory_mod, aux)."""
    tm = cache["text_memory"].astype(jnp.float32)
    spans = batch["noun_token_spans"]
    bv = batch["box_valid"] & batch["sample_valid"][:, None]
    pooled, has_any = pool_span_features(tm, spans, bv)
    task0 = batch["task_id"].astype(jnp.int32) - 1
    valid = has_any & batch["sample_valid"]
    pooled = jax.lax.stop_gradient(pooled)
    bank = update_bank(bank, pooled, task0, valid, fifo=fifo)
    bank, center_feats, choices = cluster_select(
        bank, pooled, task0, valid, max_iters, tol)
    T = tm.shape[1]
    union = jnp.any(span_box_masks(spans, T) & bv[..., None], axis=1)
    mod = snap_text_memory(cache["img_memory"], T, union, center_feats, valid)
    return bank, mod, {"choices": choices, "pooled": pooled, "valid": valid}


def student_cluster(bank: ClusterBank, cache: Dict, batch: Dict,
                    max_iters: int = 32, tol: float = 1e-4, train: bool = True
                    ) -> Tuple[ClusterBank, jnp.ndarray, Dict]:
    """Student path (forward :236-280 / infer_choice :282-312): pool the
    "something" span, k-means-snap it; in training also the MSE feature loss.

    The span comes from the CAPTION (batch["caption_noun_span"], computed by
    finalize_text from caption.find('something')), not from per-box spans — the
    reference snaps every sample regardless of GT boxes (:288-296), so images
    with zero preferred annotations are snapped too."""
    tm = cache["text_memory"].astype(jnp.float32)
    bv = batch["box_valid"] & batch["sample_valid"][:, None]
    T = tm.shape[1]
    cap_span = batch["caption_noun_span"]                    # [B, 2]
    m = span_box_masks(cap_span[:, None, :], T)[:, 0, :]     # [B, T]
    cnt = jnp.sum(m, axis=-1)
    pooled = jnp.einsum("bt,btd->bd", m.astype(tm.dtype), tm) / \
        jnp.maximum(cnt, 1)[..., None]
    valid = (cnt > 0) & batch["sample_valid"]
    task0 = batch["task_id"].astype(jnp.int32) - 1
    pooled_sg = jax.lax.stop_gradient(pooled)
    bank, center_feats, choices = cluster_select(
        bank, pooled_sg, task0, valid, max_iters, tol)
    mod = snap_text_memory(cache["img_memory"], T, m, center_feats, valid)
    aux = {"choices": choices, "valid": valid}
    if train:
        # MSE(pooled, chosen center), averaged over samples (:269-278).
        per = jnp.mean((pooled - jax.lax.stop_gradient(center_feats)) ** 2,
                       axis=-1)
        denom = jnp.maximum(jnp.sum(valid), 1)
        aux["loss_cluster_feature"] = jnp.sum(per * valid) / denom
        aux["loss_cluster_choice"] = jnp.float32(0.0)
    return bank, mod, aux
