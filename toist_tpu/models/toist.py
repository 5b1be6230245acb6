"""The TOIST model: backbone + text encoder + joint encoder + query decoder + heads.

Behavioral spec: /root/reference/models/mdetr.py:315-462 (MDETR class) and
models/transformer.py:86-188 (two-phase protocol). The two observable seams are kept
(SURVEY.md §7 design stance):
  * ``encode``   -> memory_cache dict (Appendix B contract, batch-first arrays)
  * ``decode``   -> {pred_logits, pred_boxes, aux_*, proj_*}
so the cluster-distillation machinery can modify ``img_memory`` between the phases
(mdetr.py:399-418). ``forward`` fuses both for plain inference.

TPU-first divergences: batch-first layouts, NHWC backbone, text tokenization happens
in the data pipeline (ids arrive as static [B, T] arrays), mixed bf16 compute via the
``dtype`` field with f32 heads/softmax.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from toist_tpu.config import ModelConfig
from toist_tpu.models.joint_transformer import JointEncoder, QueryDecoder
from toist_tpu.models.layers import MLP, FeatureResizer
from toist_tpu.models.position_encoding import (LearnedPositionEmbedding2D,
                                                sine_position_embedding)
from toist_tpu.models.resnet import downsample_mask, make_resnet
from toist_tpu.models.text_encoder import RobertaEncoder


def normalize_uint8_images(images: jnp.ndarray,
                           image_mask: jnp.ndarray) -> jnp.ndarray:
    """On-device ImageNet normalization of raw u8 canvases.

    Bit-equivalent to the host path (data/transforms.to_array_and_normalize:
    same f32 x*scale - shift affine on the same u8 source — the geometric
    transforms operate on u8 PIL images either way, like the reference whose
    Normalize runs after ToTensor, datasets/transforms.py:257-273). Padded
    pixels are forced to 0.0, matching the host path's zero canvas (the
    reference also pads AFTER normalizing, util/misc.py:184-209). XLA fuses
    the affine + mask into the stem input chain, so shipping u8 costs no
    extra pass while moving 4x fewer host->device bytes.
    """
    from toist_tpu.data.transforms import _NORM_SCALE, _NORM_SHIFT
    scale = jnp.asarray(_NORM_SCALE)
    shift = jnp.asarray(_NORM_SHIFT)
    keep = jnp.logical_not(image_mask)[..., None].astype(jnp.float32)
    return (images.astype(jnp.float32) * scale - shift) * keep


class TOIST(nn.Module):
    cfg: ModelConfig
    # Text encoder size knobs (roberta-base defaults; tests shrink these).
    text_vocab_size: int = 50265
    text_hidden: int = 768
    text_layers: int = 12
    text_heads: int = 12
    text_intermediate: int = 3072
    backbone_norm: str = "frozen_bn"
    # Optional data-parallel jax.sharding.Mesh: lets the fused attention
    # kernel run per-shard under shard_map on multi-device meshes (a bare
    # pallas_call has no SPMD rule). None on single-chip.
    mesh: Any = None

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32

    def setup(self):
        cfg = self.cfg
        dt = self.compute_dtype
        self.backbone = make_resnet(cfg.backbone, self.backbone_norm,
                                    cfg.dilation, dt, remat=cfg.remat)
        self.input_proj = nn.Conv(cfg.hidden_dim, (1, 1), dtype=dt,
                                  name="input_proj")
        self.text_encoder = RobertaEncoder(
            vocab_size=self.text_vocab_size, hidden_size=self.text_hidden,
            num_layers=self.text_layers, num_heads=self.text_heads,
            intermediate_size=self.text_intermediate, dropout=cfg.dropout,
            dtype=dt, add_pooler=cfg.contrastive_loss, name="text_encoder")
        if cfg.contrastive_loss:
            # CLS token prepended to the image sequence (transformer.py:55,
            # 107-119); its encoder output is the pooled image representation.
            self.CLS = self.param("CLS", nn.initializers.normal(1.0),
                                  (1, cfg.hidden_dim))
        if cfg.position_embedding == "learned":
            self.learned_pos = LearnedPositionEmbedding2D(
                cfg.hidden_dim // 2, dtype=dt, name="learned_pos")
        # The reference hardcodes the resizer's dropout at 0.1 independent of
        # --dropout (transformer.py:473-492), so it gets its own explicit
        # config knob (default 0.1 = reference behavior at every --dropout;
        # deterministic runs set model.resizer_dropout=0.0 alongside
        # model.dropout=0.0).
        self.resizer = FeatureResizer(
            cfg.hidden_dim, dropout=cfg.resizer_dropout,
            dtype=dt, name="resizer")
        fused = cfg.fused_attention
        if fused == "auto":
            import jax

            # On for any TPU process: single-chip directly, multi-device via
            # the shard_map wrapper in ops/flash_attention (the kernel runs
            # per-shard on the local batch; requires the mesh to be threaded
            # in through build_model so the module knows the data axis).
            # Multi-device WITHOUT a mesh stays off — a bare pallas_call
            # inside pjit has no SPMD partitioning rule and XLA would
            # gather/replicate the operands around it.
            fused = ("on" if jax.default_backend() != "cpu"
                     and (jax.device_count() == 1 or self.mesh is not None)
                     else "off")
        self.encoder = JointEncoder(cfg.hidden_dim, cfg.nheads, cfg.enc_layers,
                                    cfg.dim_feedforward, cfg.dropout, dt,
                                    remat=cfg.remat, fused=fused,
                                    mesh=self.mesh, name="encoder")
        self.decoder = QueryDecoder(cfg.hidden_dim, cfg.nheads, cfg.dec_layers,
                                    cfg.dim_feedforward, cfg.dropout, dt,
                                    fused=fused, mesh=self.mesh,
                                    name="decoder")
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (cfg.num_queries, cfg.hidden_dim))
        self.class_embed = nn.Dense(cfg.num_classes + 1, dtype=jnp.float32,
                                    name="class_embed")
        self.bbox_embed = MLP(cfg.hidden_dim, 4, 3, dtype=jnp.float32,
                              name="bbox_embed")
        if cfg.contrastive_align_loss:
            self.proj_image = nn.Dense(cfg.contrastive_hdim, dtype=jnp.float32,
                                       name="contrastive_align_projection_image")
            self.proj_text = nn.Dense(cfg.contrastive_hdim, dtype=jnp.float32,
                                      name="contrastive_align_projection_text")
        if cfg.masks:
            from toist_tpu.models.segmentation import (
                MaskHeadSmallConv, MaskHeadSmallConvFolded, MHAttentionMap)
            self.bbox_attention = MHAttentionMap(
                cfg.hidden_dim, cfg.nheads, dtype=self.compute_dtype,
                name="bbox_attention")
            # Both layouts share the same param tree under "mask_head"
            # (checkpoint-interchangeable; equivalence tested in
            # tests/test_segmentation.py).
            if cfg.mask_head_layout.startswith("folded"):
                impl = ("shifts" if cfg.mask_head_layout == "folded_shifts"
                        else "grouped")
                self.mask_head = MaskHeadSmallConvFolded(
                    cfg.hidden_dim + cfg.nheads, cfg.hidden_dim,
                    conv_impl=impl, dtype=self.compute_dtype,
                    name="mask_head")
            else:
                self.mask_head = MaskHeadSmallConv(
                    cfg.hidden_dim + cfg.nheads, cfg.hidden_dim,
                    dtype=self.compute_dtype, name="mask_head")

    def encode(self, images: jnp.ndarray, image_mask: jnp.ndarray,
               text_ids: jnp.ndarray, text_mask: jnp.ndarray,
               deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        """Phase 1 (mdetr.py:377-394 + transformer.py:98-168).

        Args: images [B,H,W,3] f32 normalized (or u8 raw — normalized
              on-device, see normalize_uint8_images), image_mask [B,H,W]
              True=pad,
              text_ids [B,T] i32, text_mask [B,T] True=pad.
        Returns memory_cache (batch-first), incl. features for the mask head.
        """
        dt = self.compute_dtype
        if images.dtype == jnp.uint8:
            images = normalize_uint8_images(images, image_mask)
        feats = self.backbone(images.astype(dt), pad_mask=image_mask)
        src = feats["layer4"]
        B, fh, fw, _ = src.shape
        fmask = downsample_mask(image_mask, fh, fw)
        if self.cfg.position_embedding == "learned":
            pos = self.learned_pos(B, fh, fw)
        else:
            pos = sine_position_embedding(fmask, self.cfg.hidden_dim // 2,
                                          dtype=dt)
        src = self.input_proj(src)

        img_tokens = src.reshape(B, fh * fw, self.cfg.hidden_dim)
        pos_tokens = pos.reshape(B, fh * fw, self.cfg.hidden_dim)
        img_token_mask = fmask.reshape(B, fh * fw)

        text_pooled = None
        if self.cfg.contrastive_loss:
            # Prepend CLS to the image tokens: zero position embedding, never
            # masked (transformer.py:107-119).
            cls = jnp.broadcast_to(self.CLS.astype(dt)[None],
                                   (B, 1, self.cfg.hidden_dim))
            img_tokens = jnp.concatenate([cls, img_tokens], axis=1)
            pos_tokens = jnp.concatenate(
                [jnp.zeros((B, 1, self.cfg.hidden_dim), dt), pos_tokens],
                axis=1)
            img_token_mask = jnp.concatenate(
                [jnp.zeros((B, 1), bool), img_token_mask], axis=1)
            text_last, text_pooled = self.text_encoder(
                text_ids, key_padding_mask=text_mask,
                deterministic=deterministic)
        else:
            text_last = self.text_encoder(text_ids, key_padding_mask=text_mask,
                                          deterministic=deterministic)
        text_resized = self.resizer(text_last, deterministic=deterministic)

        joint = jnp.concatenate([img_tokens, text_resized.astype(dt)], axis=1)
        joint_mask = jnp.concatenate([img_token_mask, text_mask], axis=1)
        joint_pos = jnp.concatenate(
            [pos_tokens, jnp.zeros_like(text_resized, dtype=dt)], axis=1)

        img_memory = self.encoder(joint, joint_pos, joint_mask,
                                  deterministic=deterministic)
        T = text_ids.shape[1]
        memory_cache = {
            "text_memory_resized": text_resized,
            "text_memory": img_memory[:, -T:],
            "img_memory": img_memory,
            "mask": joint_mask,
            "text_attention_mask": text_mask,
            "pos_embed": joint_pos,
            "feature_hw": (fh, fw),
            # mask-head inputs (reference segmentation.py:77-78)
            "features_c2": feats["layer1"],
            "features_c3": feats["layer2"],
            "features_c4": feats["layer3"],
            "src_proj": src,
            "feature_mask": fmask,
        }
        if self.cfg.contrastive_loss:
            # Pooled global representations (transformer.py:159-160).
            memory_cache["text_pooled_op"] = text_pooled
            memory_cache["img_pooled_op"] = img_memory[:, 0]
        return memory_cache

    def decode(self, memory_cache: Dict[str, jnp.ndarray],
               deterministic: bool = True,
               use_modified_memory: bool = False) -> Dict[str, jnp.ndarray]:
        """Phase 2 (mdetr.py:396-462): decoder over (possibly modified) memory."""
        mem_key = "img_memory_mod" if use_modified_memory else "img_memory"
        memory = memory_cache[mem_key]
        B = memory.shape[0]
        dt = self.compute_dtype
        query_pos = jnp.broadcast_to(
            self.query_embed.astype(dt)[None],
            (B,) + self.query_embed.shape)
        tgt = jnp.zeros_like(query_pos)
        hs = self.decoder(tgt, memory, query_pos, memory_cache["pos_embed"],
                          memory_cache["mask"], deterministic=deterministic)
        hs32 = hs.astype(jnp.float32)
        outputs_class = self.class_embed(hs32)          # [L, B, Q, C+1]
        outputs_coord = nn.sigmoid(self.bbox_embed(hs32))
        out = {
            "pred_logits": outputs_class[-1],
            "pred_boxes": outputs_coord[-1],
            "aux_pred_logits": outputs_class[:-1],
            "aux_pred_boxes": outputs_coord[:-1],
            "hs": hs32,
        }
        if self.cfg.contrastive_align_loss:
            pq = self.proj_image(hs32)
            pt = self.proj_text(memory_cache["text_memory"].astype(jnp.float32))
            pq = pq / jnp.linalg.norm(pq, axis=-1, keepdims=True).clip(1e-6)
            pt = pt / jnp.linalg.norm(pt, axis=-1, keepdims=True).clip(1e-6)
            out["proj_queries"] = pq[-1]
            out["proj_tokens"] = pt
            out["aux_proj_queries"] = pq[:-1]
        return out

    def compute_masks(self, memory_cache: Dict[str, jnp.ndarray],
                      hs_last: jnp.ndarray,
                      query_idx: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Per-query stride-4 mask logits (reference segmentation.py:156-167).

        hs_last: [B, Q, D] last decoder layer. query_idx: optional [B, N] query
        selection (training runs only the matched queries; None = all).
        Returns [B, N or Q, H/4, W/4] float32 logits.
        """
        # Derive the feature grid from src_proj's static shape: feature_hw in
        # the cache becomes a traced value after crossing a jit boundary.
        B, fh, fw, D = memory_cache["src_proj"].shape
        off = 1 if self.cfg.contrastive_loss else 0  # skip the CLS slot
        memory = memory_cache["img_memory"][:, off:off + fh * fw].reshape(
            B, fh, fw, D)
        if query_idx is not None:
            sel = jnp.clip(query_idx, 0, hs_last.shape[1] - 1)
            hs_sel = jnp.take_along_axis(hs_last, sel[..., None], axis=1)
        else:
            hs_sel = hs_last
        N = hs_sel.shape[1]
        att = self.bbox_attention(hs_sel.astype(self.compute_dtype), memory,
                                  pad_mask=memory_cache["feature_mask"])
        src = memory_cache["src_proj"]                       # [B, fh, fw, D]
        if self.cfg.mask_head_layout.startswith("folded"):
            # Folded layout: src stays per-image, att stays per-query; the
            # head folds queries into channels (segmentation.py).
            logits = self.mask_head(src, att, memory_cache["features_c4"],
                                    memory_cache["features_c3"],
                                    memory_cache["features_c2"])
        else:
            x = jnp.concatenate([
                jnp.repeat(src, N, axis=0),
                att.transpose(0, 1, 3, 4, 2).reshape(B * N, fh, fw,
                                                     self.cfg.nheads),
            ], axis=-1)
            logits = self.mask_head(x, memory_cache["features_c4"],
                                    memory_cache["features_c3"],
                                    memory_cache["features_c2"],
                                    num_queries=N)
        h4, w4 = logits.shape[1], logits.shape[2]
        return logits.reshape(B, N, h4, w4).astype(jnp.float32)

    def __call__(self, images, image_mask, text_ids, text_mask,
                 deterministic: bool = True):
        """Fused encode+decode for plain inference/training without cluster."""
        cache = self.encode(images, image_mask, text_ids, text_mask,
                            deterministic)
        return self.decode(cache, deterministic), cache

    def init_forward(self, images, image_mask, text_ids, text_mask):
        """Initialization trace covering every submodule (incl. mask head)."""
        out, cache = self(images, image_mask, text_ids, text_mask, True)
        if self.cfg.masks:
            B = images.shape[0]
            idx = jnp.zeros((B, 1), jnp.int32)
            out["pred_masks_init"] = self.compute_masks(cache, out["hs"][-1],
                                                        idx)
        return out


def build_model(cfg: ModelConfig, text_vocab_size: int = 50265,
                tiny_text: bool = False, backbone_norm: Optional[str] = None,
                mesh: Any = None) -> TOIST:
    kwargs: Dict[str, Any] = dict(
        cfg=cfg, text_vocab_size=text_vocab_size,
        text_hidden=cfg.text_hidden, text_layers=cfg.text_layers,
        text_heads=cfg.text_heads, text_intermediate=cfg.text_intermediate,
        backbone_norm=cfg.backbone_norm, mesh=mesh)
    if tiny_text:  # test convenience override
        kwargs.update(text_hidden=64, text_layers=2, text_heads=4,
                      text_intermediate=128)
    if backbone_norm is not None:
        kwargs["backbone_norm"] = backbone_norm
    return TOIST(**kwargs)
