"""Optimizer, per-group LR schedules, and EMA.

Behavioral spec: /root/reference/main.py:351-392 (3 param groups: backbone at
lr_backbone, text encoder at text_encoder_lr, rest at lr; frozen groups excluded) and
/root/reference/util/optim.py:29-90 (per-step schedule: step-decay
0.1^(epoch//lr_drop) for model+backbone; warmup + linear decay for the text encoder
under the default "linear_with_warmup"). EMA decay 0.9998 over all params
(util/optim.py:9-26).

In optax the groups become parameter labels consumed by optax.multi_transform, and the
schedule is a function of the global step (epoch = step // steps_per_epoch), so the
whole update stays inside the jitted train step — no host-side LR pokes.
"""
from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax

from toist_tpu.config import OptimConfig


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def label_params(params: Any, frozen_detector: bool = False,
                 freeze_text_encoder: bool = False) -> Any:
    """Label pytree: frozen (stem+layer1, reference backbone.py:68-73),
    backbone, text_encoder, model.

    frozen_detector=True (seg training, reference --frozen_weights +
    segmentation.py:22-24): everything except the mask branch is frozen.
    freeze_text_encoder=True (reference --freeze_text_encoder, main.py:146-153
    + transformer.py:66-69): the text encoder takes no updates."""
    def label(path, _leaf):
        p = _path_str(path)
        if frozen_detector:
            return ("model" if ("bbox_attention" in p or "mask_head" in p)
                    else "frozen")
        if "backbone/" in p:
            first = p.split("backbone/")[1].split("/")[0]
            if first in ("conv1", "FrozenBN_0", "GroupNorm_0") or \
               first.startswith("layer1_"):
                return "frozen"
            return "backbone"
        if "text_encoder" in p:
            return "frozen" if freeze_text_encoder else "text_encoder"
        return "model"
    return jax.tree_util.tree_map_with_path(label, params)


def stop_frozen_gradients(params: Any, frozen_detector: bool = False,
                          freeze_text_encoder: bool = False) -> Any:
    """Wrap frozen-labeled leaves in stop_gradient inside the loss function.

    The reference freezes by `requires_grad_(False)` (stem+layer1
    backbone.py:68-73, --freeze_text_encoder main.py:146-153, seg training's
    wrapped detector segmentation.py:22-24), so torch never computes those
    backward passes AND its clip_grad_norm_ never sees them. Matching that
    here needs more than optax.set_to_zero (which only drops the update after
    the fact): stop_gradient makes the frozen leaves' gradients symbolic
    zeros, so (a) XLA dead-code-eliminates the frozen backward — the whole
    trunk backward in frozen-detector seg training — and (b)
    clip_by_global_norm / the grad_norm metric see exactly the reference's
    trainable-only norm."""
    labels = label_params(params, frozen_detector=frozen_detector,
                          freeze_text_encoder=freeze_text_encoder)
    return jax.tree_util.tree_map(
        lambda p, l: jax.lax.stop_gradient(p) if l == "frozen" else p,
        params, labels)


def make_schedules(cfg: OptimConfig, steps_per_epoch: int,
                   total_steps: int) -> Dict[str, Callable]:
    """Per-group step->lr functions (util/optim.py:57-90 semantics)."""
    warmup = max(1, round(cfg.fraction_warmup_steps * total_steps))

    def step_gamma(step):
        epoch = step // max(steps_per_epoch, 1)
        return 0.1 ** (epoch // cfg.lr_drop)

    def linear_warmup_gamma(step):
        s = step.astype(jnp.float32) if hasattr(step, "astype") else float(step)
        up = s / warmup
        down = jnp.maximum(0.0, (total_steps - s) /
                           max(1, total_steps - warmup))
        return jnp.where(s < warmup, up, down)

    if cfg.schedule == "step":
        model_g, text_g = step_gamma, step_gamma
    elif cfg.schedule == "multistep":
        def multistep_gamma(step):
            epoch = step // max(steps_per_epoch, 1)
            milestones = jnp.arange(cfg.lr_drop, cfg.epochs, 50)
            return 0.5 ** jnp.sum(epoch >= milestones)
        model_g, text_g = multistep_gamma, multistep_gamma
    elif cfg.schedule == "linear_with_warmup":
        model_g, text_g = step_gamma, linear_warmup_gamma
    elif cfg.schedule == "all_linear_with_warmup":
        model_g, text_g = linear_warmup_gamma, linear_warmup_gamma
    else:
        raise ValueError(cfg.schedule)

    return {
        "model": lambda s: cfg.lr * model_g(s),
        "backbone": lambda s: cfg.lr_backbone * model_g(s),
        "text_encoder": lambda s: cfg.text_encoder_lr * text_g(s),
        "frozen": lambda s: 0.0,
    }


def make_optimizer(cfg: OptimConfig, steps_per_epoch: int, total_steps: int,
                   frozen_detector: bool = False,
                   freeze_text_encoder: bool = False
                   ) -> optax.GradientTransformation:
    """Build the grouped optimizer; parameter labels are resolved lazily at
    init time (label_params passed as a callable), so no params are needed."""
    schedules = make_schedules(cfg, steps_per_epoch, total_steps)

    def group(name):
        # mu_dtype="bfloat16" (optim.moment_dtype) halves the first-moment
        # HBM traffic and storage (370 MB at flagship scale); the reference
        # keeps f32 torch AdamW state, so f32 stays the default.
        tx = optax.adamw(learning_rate=schedules[name],
                         weight_decay=cfg.weight_decay,
                         mu_dtype=getattr(cfg, "moment_dtype", "float32"))
        if name == "frozen":
            tx = optax.set_to_zero()
        return tx

    import functools
    labeler = functools.partial(label_params, frozen_detector=frozen_detector,
                                freeze_text_encoder=freeze_text_encoder)
    return optax.chain(
        optax.clip_by_global_norm(cfg.clip_max_norm),
        optax.multi_transform(
            {name: group(name) for name in
             ("model", "backbone", "text_encoder", "frozen")}, labeler),
    )


def ema_update(ema_params: Any, params: Any, decay: float) -> Any:
    """w_ema = w_ema * decay + (1 - decay) * w (util/optim.py:9-26)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + (1.0 - decay) * p, ema_params, params)
