"""Golden numeric parity vs the reference implementation itself.

The reference's matcher / SetCriterion / transformer stacks / kmeans are imported
directly (tests/reference_shim.py stubs torchvision+timm, everything else is in
the image) and run as torch oracles on shared random inputs. This converts the
"within 0.2 mAP" parity bar into component-level numeric evidence:

  matcher          vs toist_tpu/ops/matching.py      (models/matcher.py:16-87)
  loss_labels      vs train/criterion.loss_labels    (models/mdetr.py:488-518)
  loss_boxes       vs train/criterion.loss_boxes     (models/mdetr.py:805-825)
  cardinality      vs train/criterion.loss_cardinality (models/mdetr.py:783-803)
  contrastive      vs train/criterion.loss_contrastive_align (mdetr.py:601-666)
  softkd           vs train/criterion.loss_softkd    (models/mdetr.py:520-599)
  nsthl2           vs train/criterion.loss_nsthl2    (models/mdetr.py:668-781)
  focal/dice       vs train/criterion focal+dice     (models/segmentation.py:276-319)
  encoder stack    vs models/joint_transformer.py    (models/transformer.py:191-331)
  decoder stack    vs models/joint_transformer.py    (models/transformer.py:334-470)
  RobertaModel     vs models/text_encoder.py         (HF torch RobertaModel)
  kmeans           vs ops/kmeans.py                  (models/kmeans.py)
  sine pos-enc     vs models/position_encoding.py    (models/position_encoding.py:13-49)
  PostProcess      vs models/postprocess.py          (models/postprocessors.py:18-56)
"""
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests import reference_shim
from toist_tpu.ops import box_ops as my_box_ops
from toist_tpu.ops import matching as my_matching
from toist_tpu.train import criterion as crit
from toist_tpu.utils import convert


@pytest.fixture(scope="module")
def ref():
    return reference_shim.load()


def _t(x):
    return torch.as_tensor(np.asarray(x))


def _indices_to_t2q(indices, B, N):
    """Reference per-image (src_queries, tgt_idx) lists -> [B, N] t2q array."""
    t2q = np.full((B, N), -1, np.int32)
    for b, (src, tgt) in enumerate(indices):
        for q, t in zip(np.asarray(src), np.asarray(tgt)):
            t2q[b, t] = q
    return jnp.asarray(t2q)


def _rand_problem(seed=0, B=3, Q=12, L=20, counts=(4, 2, 3)):
    """Shared random matching/loss problem in both frameworks' layouts."""
    rng = np.random.default_rng(seed)
    N = max(counts)
    logits = rng.normal(size=(B, Q, L)).astype(np.float32)
    pboxes = np.concatenate([rng.uniform(0.3, 0.7, (B, Q, 2)),
                             rng.uniform(0.05, 0.3, (B, Q, 2))],
                            axis=-1).astype(np.float32)
    tboxes = np.zeros((B, N, 4), np.float32)
    pm = np.zeros((B, N, L), np.float32)
    bv = np.zeros((B, N), bool)
    targets, pm_flat = [], []
    for b, n in enumerate(counts):
        tb = np.concatenate([rng.uniform(0.3, 0.7, (n, 2)),
                             rng.uniform(0.05, 0.3, (n, 2))],
                            axis=-1).astype(np.float32)
        rows = rng.uniform(0.0, 1.0, (n, L)).astype(np.float32)
        rows /= rows.sum(-1, keepdims=True)
        tboxes[b, :n] = tb
        pm[b, :n] = rows
        bv[b, :n] = True
        targets.append({"boxes": _t(tb), "labels": torch.zeros(n)})
        pm_flat.append(rows)
    pm_flat = np.concatenate(pm_flat, axis=0)
    return types.SimpleNamespace(
        B=B, Q=Q, L=L, N=N, counts=counts,
        logits=logits, pboxes=pboxes, tboxes=tboxes, pm=pm, bv=bv,
        targets=targets, pm_flat=pm_flat,
        sv=np.ones((B,), bool), num_boxes=float(sum(counts)))


# ---------------------------------------------------------------------------
# box ops
# ---------------------------------------------------------------------------
def test_giou_parity(ref):
    rng = np.random.default_rng(0)
    # Sorting the two corner points per box gives valid (x0,y0,x1,y1).
    a = np.sort(rng.uniform(0, 1, (17, 2, 2)), axis=1).reshape(17, 4)
    b = np.sort(rng.uniform(0, 1, (9, 2, 2)), axis=1).reshape(9, 4)
    want = ref.box_ops.generalized_box_iou(_t(a), _t(b)).numpy()
    got = np.asarray(my_box_ops.generalized_box_iou(jnp.asarray(a),
                                                    jnp.asarray(b)))
    np.testing.assert_allclose(got, want, atol=1e-6)


# ---------------------------------------------------------------------------
# Hungarian matcher (cost build + assignment, end to end)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_matcher_parity(ref, seed):
    p = _rand_problem(seed=seed)
    matcher = ref.matcher.HungarianMatcher(cost_class=1, cost_bbox=5,
                                           cost_giou=2)
    with torch.no_grad():
        indices = matcher({"pred_logits": _t(p.logits),
                           "pred_boxes": _t(p.pboxes)},
                          p.targets, _t(p.pm_flat))
    want = _indices_to_t2q(indices, p.B, p.N)
    got = my_matching.hungarian_match(
        jnp.asarray(p.logits), jnp.asarray(p.pboxes), jnp.asarray(p.tboxes),
        jnp.asarray(p.pm), jnp.asarray(p.bv)).tgt2query
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


# ---------------------------------------------------------------------------
# SetCriterion integration: matcher + labels + boxes + cardinality in one call
# ---------------------------------------------------------------------------
def _make_ref_criterion(ref, Q, losses, eos_coef=0.1, temperature=0.07):
    args = types.SimpleNamespace(num_queries=Q, nsthl2_loss=False,
                                 softkd_loss=False)
    matcher = ref.matcher.HungarianMatcher(cost_class=1, cost_bbox=5,
                                           cost_giou=2)
    return ref.mdetr.SetCriterion(args, num_classes=255, matcher=matcher,
                                  eos_coef=eos_coef, losses=losses,
                                  temperature=temperature, contrastive_hdim=64)


def test_criterion_forward_parity(ref):
    """End-to-end single-mode forward: matching + CE + L1 + GIoU + cardinality."""
    p = _rand_problem(seed=7)
    criterion = _make_ref_criterion(ref, p.Q, ["labels", "boxes", "cardinality"])
    with torch.no_grad():
        want = criterion(None, {"pred_logits": _t(p.logits),
                                "pred_boxes": _t(p.pboxes)},
                         p.targets, _t(p.pm_flat), None)

    from toist_tpu.config import LossConfig
    batch = {"boxes": jnp.asarray(p.tboxes), "positive_map": jnp.asarray(p.pm),
             "box_valid": jnp.asarray(p.bv), "sample_valid": jnp.asarray(p.sv),
             "text_mask": jnp.zeros((p.B, 8), bool)}
    got = crit.set_criterion(
        {"pred_logits": jnp.asarray(p.logits),
         "pred_boxes": jnp.asarray(p.pboxes)},
        batch, LossConfig(aux_loss=False))
    for k in ("loss_ce", "loss_bbox", "loss_giou", "cardinality_error"):
        np.testing.assert_allclose(float(got[k]), float(want[k]), rtol=2e-5,
                                   atol=1e-6, err_msg=k)


def test_loss_labels_eos_weighting_parity(ref):
    """loss_labels with a different eos_coef, pairing fixed by hand."""
    p = _rand_problem(seed=11, counts=(1, 5, 2))
    criterion = _make_ref_criterion(ref, p.Q, ["labels"], eos_coef=0.3)
    matcher = criterion.matcher
    with torch.no_grad():
        indices = matcher({"pred_logits": _t(p.logits),
                           "pred_boxes": _t(p.pboxes)}, p.targets,
                          _t(p.pm_flat))
        want = criterion.loss_labels(None,
                                     {"pred_logits": _t(p.logits)},
                                     p.targets, _t(p.pm_flat), indices,
                                     p.num_boxes)["loss_ce"]
    t2q = _indices_to_t2q(indices, p.B, p.N)
    got = crit.loss_labels(jnp.asarray(p.logits), jnp.asarray(p.pm), t2q,
                           jnp.asarray(p.bv),
                           jnp.asarray(p.sv, jnp.float32), 0.3,
                           jnp.float32(p.num_boxes))
    np.testing.assert_allclose(float(got), float(want), rtol=2e-5)


# ---------------------------------------------------------------------------
# contrastive align
# ---------------------------------------------------------------------------
def test_contrastive_align_parity(ref):
    rng = np.random.default_rng(3)
    B, Q, T, H = 2, 8, 10, 16
    counts = (3, 2)
    N = max(counts)
    pq = rng.normal(size=(B, Q, H)).astype(np.float32)
    pq /= np.linalg.norm(pq, axis=-1, keepdims=True)
    pt = rng.normal(size=(B, T, H)).astype(np.float32)
    pt /= np.linalg.norm(pt, axis=-1, keepdims=True)

    # char == token (identity map): spans in chars are spans in tokens.
    char_maps = [{c: c for c in range(T)} for _ in range(B)]
    tokenized = reference_shim.FakeTokenized(char_maps)
    # char spans per box, [beg, end) in chars -> tokens beg..end-1 inclusive
    spans = [[(0, 4), (2, 6), (5, 9)], [(1, 3), (4, 8)]]

    targets, pm = [], np.zeros((B, N, 256), np.float32)
    bv = np.zeros((B, N), bool)
    for b, n in enumerate(counts):
        targets.append({
            "boxes": torch.rand(n, 4) * 0.3 + 0.3,
            "labels": torch.zeros(n),
            "tokens_positive": [[list(spans[b][j])] for j in range(n)],
        })
        for j in range(n):
            beg, end = spans[b][j]
            pm[b, j, beg:end] = 1.0
        bv[b, :n] = True
    num_boxes = float(sum(counts))

    # Pairing: arbitrary but consistent.
    indices = [(torch.as_tensor([5, 1, 7]), torch.as_tensor([0, 1, 2])),
               (torch.as_tensor([2, 4]), torch.as_tensor([0, 1]))]
    criterion = _make_ref_criterion(ref, Q, ["contrastive_align"],
                                    temperature=0.07)
    outputs = {"proj_queries": _t(pq), "proj_tokens": _t(pt),
               "tokenized": tokenized}
    with torch.no_grad():
        want = criterion.loss_contrastive_align(
            None, outputs, targets, None, indices, num_boxes
        )["loss_contrastive_align"]

    t2q = _indices_to_t2q(indices, B, N)
    got = crit.loss_contrastive_align(
        jnp.asarray(pq), jnp.asarray(pt), jnp.asarray(pm), t2q,
        jnp.asarray(bv), jnp.zeros((B, T), bool), jnp.ones((B,), bool),
        0.07, jnp.float32(num_boxes))
    np.testing.assert_allclose(float(got), float(want), rtol=2e-5)


# ---------------------------------------------------------------------------
# softkd
# ---------------------------------------------------------------------------
def test_softkd_parity(ref):
    rng = np.random.default_rng(5)
    B, Q, L = 2, 10, 16
    counts = (3, 2)
    N = max(counts)
    ln = rng.normal(size=(B, Q, L)).astype(np.float32)
    ls = rng.normal(size=(B, Q, L)).astype(np.float32)
    bn = np.concatenate([rng.uniform(0.3, 0.7, (B, Q, 2)),
                         rng.uniform(0.05, 0.3, (B, Q, 2))], -1).astype(np.float32)
    bs_ = np.concatenate([rng.uniform(0.3, 0.7, (B, Q, 2)),
                          rng.uniform(0.05, 0.3, (B, Q, 2))], -1).astype(np.float32)
    idx_n = [(torch.as_tensor([0, 4, 7]), torch.as_tensor([0, 1, 2])),
             (torch.as_tensor([3, 9]), torch.as_tensor([1, 0]))]
    idx_s = [(torch.as_tensor([2, 5, 6]), torch.as_tensor([1, 0, 2])),
             (torch.as_tensor([1, 8]), torch.as_tensor([0, 1]))]
    criterion = _make_ref_criterion(ref, Q, ["softkd"])
    out_n = {"pred_logits": _t(ln), "pred_boxes": _t(bn)}
    out_s = {"pred_logits": _t(ls), "pred_boxes": _t(bs_)}
    with torch.no_grad():
        want = criterion.loss_softkd(
            [None, None], [out_n, out_s], [None, None], None,
            [idx_n, idx_s], [None, None])["loss_softkd"]

    bv = np.zeros((B, N), bool)
    for b, n in enumerate(counts):
        bv[b, :n] = True
    got = crit.loss_softkd(
        jnp.asarray(ln), jnp.asarray(ls), jnp.asarray(bn), jnp.asarray(bs_),
        _indices_to_t2q(idx_n, B, N), _indices_to_t2q(idx_s, B, N),
        jnp.asarray(bv), jnp.ones((B,), bool))
    np.testing.assert_allclose(float(got), float(want), rtol=3e-5, atol=1e-7)


# ---------------------------------------------------------------------------
# nsthl2
# ---------------------------------------------------------------------------
def test_nsthl2_parity(ref):
    rng = np.random.default_rng(6)
    B, T, D = 2, 9, 12
    counts = (2, 3)
    N = max(counts)
    tm_n = rng.normal(size=(B, T, D)).astype(np.float32)
    tm_s = rng.normal(size=(B, T, D)).astype(np.float32)
    char_maps = [{c: c for c in range(T)} for _ in range(B)]
    tokenized = reference_shim.FakeTokenized(char_maps)
    spans = [[(0, 3), (4, 7)], [(2, 5), (1, 2), (6, 9)]]

    def targets_for(spans_b):
        return [{"noun_tokens_positive": [[list(sp)] for sp in spans[b]]}
                for b in range(B)]

    targets = targets_for(spans)
    idx = [(torch.as_tensor([1, 3]), torch.as_tensor([0, 1])),
           (torch.as_tensor([0, 2, 5]), torch.as_tensor([0, 1, 2]))]
    criterion = _make_ref_criterion(ref, 10, ["nsthl2"])
    mc_n = {"text_memory": _t(tm_n).permute(1, 0, 2)}  # ref layout [T, B, D]
    mc_s = {"text_memory": _t(tm_s).permute(1, 0, 2)}
    out = {"proj_queries": torch.zeros(B, 10, 4), "tokenized": tokenized}
    with torch.no_grad():
        want = criterion.loss_nsthl2(
            [mc_n, mc_s], [out, out], [targets, targets], None,
            [idx, idx], [None, None], None)["loss_nsthl2"]

    sp = np.full((B, N, 2), -1, np.int32)
    bv = np.zeros((B, N), bool)
    for b, n in enumerate(counts):
        for j in range(n):
            beg, end = spans[b][j]
            sp[b, j] = (beg, end - 1)  # inclusive token span
        bv[b, :n] = True
    got = crit.loss_nsthl2(jnp.asarray(tm_n), jnp.asarray(tm_s),
                           jnp.asarray(sp), jnp.asarray(sp),
                           jnp.asarray(bv), jnp.ones((B,), bool))
    np.testing.assert_allclose(float(got), float(want), rtol=2e-5)


# ---------------------------------------------------------------------------
# focal / dice
# ---------------------------------------------------------------------------
def test_focal_dice_parity(ref):
    rng = np.random.default_rng(8)
    n, P = 5, 64
    logits = rng.normal(size=(n, P)).astype(np.float32)
    targets = (rng.uniform(size=(n, P)) > 0.5).astype(np.float32)
    num_boxes = 4.0
    want_f = ref.seg.sigmoid_focal_loss(_t(logits), _t(targets), num_boxes)
    want_d = ref.seg.dice_loss(_t(logits), _t(targets), num_boxes)
    v = jnp.ones((1, n), jnp.float32)
    got_f = crit.sigmoid_focal_loss(jnp.asarray(logits)[None],
                                    jnp.asarray(targets)[None], v,
                                    jnp.float32(num_boxes))
    got_d = crit.dice_loss(jnp.asarray(logits)[None],
                           jnp.asarray(targets)[None], v,
                           jnp.float32(num_boxes))
    np.testing.assert_allclose(float(got_f), float(want_f), rtol=2e-5)
    np.testing.assert_allclose(float(got_d), float(want_d), rtol=2e-5)


# ---------------------------------------------------------------------------
# transformer stacks (weights converted through utils/convert._mha/_lin/_ln)
# ---------------------------------------------------------------------------
def _convert_encoder(sd, n_layers, d):
    enc = {}
    for i in range(n_layers):
        t = f"layers.{i}"
        enc[f"layer_{i}"] = {
            "self_attn": convert._mha(sd, f"{t}.self_attn", d),
            "ffn": {"linear1": convert._lin(sd, f"{t}.linear1"),
                    "linear2": convert._lin(sd, f"{t}.linear2")},
            "norm1": convert._ln(sd, f"{t}.norm1"),
            "norm2": convert._ln(sd, f"{t}.norm2"),
        }
    return enc


def test_encoder_stack_parity(ref):
    torch.manual_seed(0)
    d, H, L, S, B = 32, 4, 3, 11, 2
    layer = ref.transformer.TransformerEncoderLayer(d, H, 64, dropout=0.1)
    enc = ref.transformer.TransformerEncoder(layer, L).eval()
    src = torch.randn(S, B, d)
    pos = torch.randn(S, B, d)
    kpm = torch.zeros(B, S, dtype=torch.bool)
    kpm[0, -3:] = True
    with torch.no_grad():
        want = enc(src, src_key_padding_mask=kpm, pos=pos).numpy()

    sd = {k: v.numpy() for k, v in enc.state_dict().items()}
    params = _convert_encoder(sd, L, d)
    from toist_tpu.models.joint_transformer import JointEncoder
    m = JointEncoder(d_model=d, nhead=H, num_layers=L, dim_feedforward=64)
    got = m.apply({"params": params},
                  jnp.asarray(src.numpy().transpose(1, 0, 2)),
                  jnp.asarray(pos.numpy().transpose(1, 0, 2)),
                  jnp.asarray(kpm.numpy()), True)
    np.testing.assert_allclose(np.asarray(got).transpose(1, 0, 2), want,
                               atol=2e-5)


def test_decoder_stack_parity(ref):
    torch.manual_seed(1)
    d, H, L, S, Q, B = 32, 4, 3, 13, 6, 2
    layer = ref.transformer.TransformerDecoderLayer(d, H, 64, dropout=0.1)
    dec = ref.transformer.TransformerDecoder(
        layer, L, norm=torch.nn.LayerNorm(d), return_intermediate=True).eval()
    tgt = torch.zeros(Q, B, d)
    memory = torch.randn(S, B, d)
    pos = torch.randn(S, B, d)
    query_pos = torch.randn(Q, B, d)
    kpm = torch.zeros(B, S, dtype=torch.bool)
    kpm[1, -4:] = True
    with torch.no_grad():
        want = dec(tgt, memory, None, memory_key_padding_mask=kpm, pos=pos,
                   query_pos=query_pos).numpy()  # [L, Q, B, d]

    sd = {k: v.numpy() for k, v in dec.state_dict().items()}
    params = {"norm": convert._ln(sd, "norm")}
    for i in range(L):
        t = f"layers.{i}"
        params[f"layer_{i}"] = {
            "self_attn": convert._mha(sd, f"{t}.self_attn", d),
            "cross_attn_image": convert._mha(sd, f"{t}.cross_attn_image", d),
            "ffn": {"linear1": convert._lin(sd, f"{t}.linear1"),
                    "linear2": convert._lin(sd, f"{t}.linear2")},
            "norm1": convert._ln(sd, f"{t}.norm1"),
            "norm3": convert._ln(sd, f"{t}.norm3"),
            "norm4": convert._ln(sd, f"{t}.norm4"),
        }
    from toist_tpu.models.joint_transformer import QueryDecoder
    m = QueryDecoder(d_model=d, nhead=H, num_layers=L, dim_feedforward=64)
    got = m.apply({"params": params},
                  jnp.asarray(tgt.numpy().transpose(1, 0, 2)),
                  jnp.asarray(memory.numpy().transpose(1, 0, 2)),
                  jnp.asarray(query_pos.numpy().transpose(1, 0, 2)),
                  jnp.asarray(pos.numpy().transpose(1, 0, 2)),
                  jnp.asarray(kpm.numpy()), True)  # [L, B, Q, d]
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1, 3), want,
                               atol=1e-4)


# ---------------------------------------------------------------------------
# RoBERTa text encoder vs HF torch RobertaModel (random init, no download)
# ---------------------------------------------------------------------------
def test_roberta_parity(ref):
    from transformers import RobertaConfig, RobertaModel

    cfg = RobertaConfig(vocab_size=130, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=64,
                        max_position_embeddings=40, type_vocab_size=1,
                        layer_norm_eps=1e-5, pad_token_id=1,
                        attn_implementation="eager")
    torch.manual_seed(2)
    model = RobertaModel(cfg, add_pooling_layer=False).eval()
    B, T = 2, 12
    ids = torch.randint(3, 130, (B, T))
    ids[0, -4:] = 1  # padding
    attn = (ids != 1).long()
    with torch.no_grad():
        want = model(input_ids=ids, attention_mask=attn).last_hidden_state

    sd = {f"transformer.text_encoder.{k}": v.numpy()
          for k, v in model.state_dict().items()}
    params = convert._roberta(sd, 32)
    from toist_tpu.models.text_encoder import RobertaEncoder
    m = RobertaEncoder(vocab_size=130, hidden_size=32, num_layers=2,
                       num_heads=4, intermediate_size=64, max_position=40)
    got = m.apply({"params": params}, jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=3e-5)


# ---------------------------------------------------------------------------
# kmeans
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("distance", ["euclidean", "cosine"])
def test_kmeans_parity(ref, distance):
    rng = np.random.default_rng(9)
    X = rng.normal(size=(40, 8)).astype(np.float32) + \
        rng.integers(0, 3, (40, 1)).astype(np.float32) * 4.0
    init = X[[0, 15, 30]].copy()
    # full_label=1 -> warm start from the given centers (deterministic path).
    want_labels, want_centers = ref.kmeans.kmeans(
        _t(X), _t(init.copy()), 3, distance=distance, tol=1e-4, full_label=1)
    from toist_tpu.ops.kmeans import kmeans as my_kmeans
    got_labels, got_centers = my_kmeans(
        jnp.asarray(X), jnp.asarray(init), max_iters=200, tol=1e-4,
        distance=distance)
    np.testing.assert_array_equal(np.asarray(got_labels),
                                  want_labels.numpy())
    np.testing.assert_allclose(np.asarray(got_centers), want_centers.numpy(),
                               atol=1e-5)


# ---------------------------------------------------------------------------
# sine position embedding
# ---------------------------------------------------------------------------
def test_position_encoding_parity(ref):
    B, H, W = 2, 7, 9
    mask = torch.zeros(B, H, W, dtype=torch.bool)
    mask[0, 5:, :] = True
    mask[0, :, 6:] = True
    tensors = torch.zeros(B, 3, H, W)
    nt = ref.misc.NestedTensor(tensors, mask)
    pe = ref.posenc.PositionEmbeddingSine(num_pos_feats=16, normalize=True)
    with torch.no_grad():
        want = pe(nt).numpy()  # [B, 32, H, W]
    from toist_tpu.models.position_encoding import sine_position_embedding
    got = np.asarray(sine_position_embedding(jnp.asarray(mask.numpy()),
                                             num_pos_feats=16))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-5)


def test_learned_position_embedding_parity(ref):
    torch.manual_seed(4)
    pe = ref.posenc.PositionEmbeddingLearned(num_pos_feats=8)
    B, H, W = 2, 5, 7
    nt = ref.misc.NestedTensor(torch.zeros(B, 3, H, W),
                               torch.zeros(B, H, W, dtype=torch.bool))
    with torch.no_grad():
        want = pe(nt).numpy()  # [B, 16, H, W]
    from toist_tpu.models.position_encoding import LearnedPositionEmbedding2D
    params = {"row_embed": pe.row_embed.weight.detach().numpy(),
              "col_embed": pe.col_embed.weight.detach().numpy()}
    got = LearnedPositionEmbedding2D(num_pos_feats=8).apply(
        {"params": params}, B, H, W)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=1e-6)


def test_roberta_pooler_parity(ref):
    """pooler_output feeds text_pooled_op on the CLS contrastive path."""
    from transformers import RobertaConfig, RobertaModel

    cfg = RobertaConfig(vocab_size=110, hidden_size=32, num_hidden_layers=1,
                        num_attention_heads=4, intermediate_size=64,
                        max_position_embeddings=36, type_vocab_size=1,
                        layer_norm_eps=1e-5, pad_token_id=1,
                        attn_implementation="eager")
    torch.manual_seed(5)
    model = RobertaModel(cfg, add_pooling_layer=True).eval()
    ids = torch.randint(3, 110, (2, 9))
    with torch.no_grad():
        out = model(input_ids=ids, attention_mask=(ids != 1).long())

    sd = {f"transformer.text_encoder.{k}": v.numpy()
          for k, v in model.state_dict().items()}
    params = convert._roberta(sd, 32)
    from toist_tpu.models.text_encoder import RobertaEncoder
    m = RobertaEncoder(vocab_size=110, hidden_size=32, num_layers=1,
                       num_heads=4, intermediate_size=64, max_position=36,
                       add_pooler=True)
    hidden, pooled = m.apply({"params": params}, jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(np.asarray(hidden),
                               out.last_hidden_state.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(pooled),
                               out.pooler_output.numpy(), atol=3e-5)


# ---------------------------------------------------------------------------
# PostProcess
# ---------------------------------------------------------------------------
def test_postprocess_parity(ref):
    rng = np.random.default_rng(10)
    B, Q, L = 2, 6, 16
    logits = rng.normal(size=(B, Q, L)).astype(np.float32)
    boxes = np.concatenate([rng.uniform(0.3, 0.7, (B, Q, 2)),
                            rng.uniform(0.05, 0.3, (B, Q, 2))],
                           -1).astype(np.float32)
    sizes = np.asarray([[480, 640], [333, 500]], np.float32)
    pp = ref.post.PostProcess()
    with torch.no_grad():
        want = pp({"pred_logits": _t(logits), "pred_boxes": _t(boxes)},
                  _t(sizes))
    from toist_tpu.models.postprocess import postprocess_boxes
    got = postprocess_boxes(jnp.asarray(logits), jnp.asarray(boxes),
                            jnp.asarray(sizes, jnp.int32))
    for b in range(B):
        np.testing.assert_allclose(np.asarray(got["scores"][b]),
                                   want[b]["scores"].numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(got["boxes"][b]),
                                   want[b]["boxes"].numpy(), atol=1e-3)
        np.testing.assert_array_equal(np.asarray(got["labels"][b]),
                                      want[b]["labels"].numpy())


def test_full_model_forward_parity(ref):
    """End-to-end seam test (VERDICT r2 #6): reference MDETR.forward
    (two-phase, backbone stubbed with a fixed feature tensor — torchvision is
    absent; transformer + heads + contrastive projections real) vs
    TOIST.encode/decode with the reference's weights through utils/convert.

    Catches seam wiring per-stack tests cannot: resizer placement, HW
    flatten order, image/text concat order, pos-embed padding, text-slice
    indexing, per-layer head application (reference models/mdetr.py:377-462,
    models/transformer.py:86-188). Tolerance 2e-3: pure f32 accumulation
    skew between torch-oneDNN and XLA matmul orders (observed max 4.5e-4);
    a wiring bug shows as O(1) disagreement.
    """
    import dataclasses

    from toist_tpu.config import ModelConfig
    from toist_tpu.models.position_encoding import sine_position_embedding
    from toist_tpu.models.resnet import downsample_mask
    from toist_tpu.models.toist import build_model
    from toist_tpu.utils.convert import convert_torch_state_dict

    rng = np.random.default_rng(0)
    B, H, W, T, D = 2, 96, 128, 8, 64
    images = rng.standard_normal((B, H, W, 3)).astype(np.float32)
    image_mask = np.zeros((B, H, W), bool)
    image_mask[1, :, 96:] = True          # sample 1: right quarter is padding
    text_ids = np.full((B, T), 1, np.int64)
    text_ids[:, 0] = 0
    text_ids[:, 1:6] = rng.integers(4, 30000, (B, 5))
    text_mask = np.zeros((B, T), bool)
    text_mask[1, 6:] = True               # sample 1: 2 pad tokens

    # --- our model (f32 compute so tolerances are tight) ---
    cfg = ModelConfig(backbone="resnet18-test", hidden_dim=D, nheads=4,
                      dim_feedforward=128, enc_layers=2, dec_layers=2,
                      num_queries=10, contrastive_align_loss=True,
                      contrastive_hdim=16, compute_dtype="float32",
                      fused_attention="off")
    model = build_model(cfg, text_vocab_size=50265, tiny_text=True)
    init = jax.jit(lambda r, *a: model.init(r, *a))(
        jax.random.PRNGKey(0), jnp.asarray(images), jnp.asarray(image_mask),
        jnp.asarray(text_ids.astype(np.int32)), jnp.asarray(text_mask))
    our_params = init["params"]
    frozen = {k: v for k, v in init.items() if k != "params"}

    # Shared backbone features: OUR backbone output, handed to the reference
    # as its (stubbed) backbone's return value. fh/fw = H/32, W/32.
    feats = jax.jit(lambda v, x, m: model.apply(
        v, x, pad_mask=m, method=lambda mm, xx, pad_mask: mm.backbone(
            xx, pad_mask=pad_mask)))(init, jnp.asarray(images),
                                     jnp.asarray(image_mask))
    layer4 = np.asarray(feats["layer4"])              # [B, fh, fw, 2048]
    fh, fw = layer4.shape[1:3]
    fmask = np.asarray(downsample_mask(jnp.asarray(image_mask), fh, fw))
    pos = np.asarray(sine_position_embedding(jnp.asarray(fmask), D // 2,
                                             dtype=jnp.float32))

    # --- reference model with stubbed backbone + tiny random RoBERTa ---
    import transformers

    class FakeBatch(dict):
        def __getattr__(self, k):
            return self[k]

        def to(self, device):
            return self

    class FakeTokenizer:
        def batch_encode_plus(self, texts, padding=None, return_tensors=None):
            return FakeBatch(
                input_ids=_t(text_ids),
                attention_mask=_t((~text_mask).astype(np.int64)))

    real_config = transformers.RobertaConfig
    ref.transformer.RobertaConfig = lambda **kw: real_config(
        hidden_size=D, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, max_position_embeddings=514, **kw)
    ref.transformer.RobertaTokenizerFast = types.SimpleNamespace(
        from_pretrained=lambda name: FakeTokenizer())
    try:
        args = types.SimpleNamespace(without_pretrain=True, cluster=False)
        tr = ref.transformer.Transformer(
            args=args, d_model=D, nhead=4, num_encoder_layers=2,
            num_decoder_layers=2, dim_feedforward=128, dropout=0.1,
            return_intermediate_dec=True, contrastive_loss=False)
    finally:
        ref.transformer.RobertaConfig = real_config

    class FakeBackbone(torch.nn.Module):
        num_channels = 2048

        def forward(self, samples):
            src = _t(np.moveaxis(layer4, -1, 1)).float()
            p = _t(np.moveaxis(pos, -1, 1)).float()
            return [ref.misc.NestedTensor(src, _t(fmask))], [p]

    ref_model = ref.mdetr.MDETR(
        FakeBackbone(), tr, num_classes=255, num_queries=10, aux_loss=True,
        contrastive_hdim=16, contrastive_align_loss=True, args=args)
    ref_model.eval()

    # --- weights: reference -> ours (backbone keys absent, overlay) ---
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    conv_params, _conv_frozen = convert_torch_state_dict(
        sd, d_model=D, enc_layers=2, dec_layers=2)
    merged = dict(our_params)
    merged.update(conv_params)

    out, cache = jax.jit(
        lambda v, *a: model.apply(v, *a, deterministic=True))(
        {"params": merged, **frozen}, jnp.asarray(images),
        jnp.asarray(image_mask), jnp.asarray(text_ids.astype(np.int32)),
        jnp.asarray(text_mask))

    with torch.no_grad():
        samples = ref.misc.NestedTensor(
            _t(np.moveaxis(images, -1, 1)).float(), _t(image_mask))
        mc = ref_model(samples, ["a", "b"], encode_and_save=True)
        ref_out = ref_model(samples, ["a", "b"], encode_and_save=False,
                            memory_cache=mc)

    # encoder memory: [S, B, D] seq-first in the reference
    np.testing.assert_allclose(
        np.asarray(cache["img_memory"]),
        mc["img_memory"].numpy().transpose(1, 0, 2), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(cache["text_memory"]),
        mc["text_memory"].numpy().transpose(1, 0, 2), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["pred_logits"]),
                               ref_out["pred_logits"].numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["pred_boxes"]),
                               ref_out["pred_boxes"].numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["proj_queries"]),
                               ref_out["proj_queries"].numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["proj_tokens"]),
                               ref_out["proj_tokens"].numpy(), atol=2e-3)
    for i, aux in enumerate(ref_out["aux_outputs"]):
        np.testing.assert_allclose(np.asarray(out["aux_pred_logits"][i]),
                                   aux["pred_logits"].numpy(), atol=2e-3)
        np.testing.assert_allclose(np.asarray(out["aux_pred_boxes"][i]),
                                   aux["pred_boxes"].numpy(), atol=2e-3)
        np.testing.assert_allclose(np.asarray(out["aux_proj_queries"][i]),
                                   aux["proj_queries"].numpy(), atol=2e-3)
