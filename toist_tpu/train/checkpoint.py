"""Checkpoint save/restore via Orbax.

Reference format: one torch dict {model, model_ema, model_noun, model_noun_ema,
optimizer, epoch, args, cluster_criterion} written per epoch by rank 0
(main.py:641-652). Here the TrainState pytree (+ frozen collections + epoch) goes
through orbax's atomic async-capable checkpointer; the three load modes (--load
warm-start, --resume full restore, --frozen_weights into a submodule) map to
`load_params` / `restore` / caller-side tree surgery.
"""
from __future__ import annotations

import os
from typing import Any, Tuple

import orbax.checkpoint as ocp

from toist_tpu.train.state import TrainState


def _ckptr():
    return ocp.PyTreeCheckpointer()


_ASYNC: "ocp.AsyncCheckpointer | None" = None


def _async_ckptr():
    global _ASYNC
    if _ASYNC is None:
        _ASYNC = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC


def save(path: str, state: TrainState, frozen: Any, epoch: int,
         async_save: bool = False) -> None:
    """Atomic full-state save (rank 0 writes under multihost orbax).

    async_save=True hands serialization to orbax's background thread so the
    next epoch starts immediately (the write of the ~2GB flagship state
    otherwise blocks the step loop); a later save/close waits for the
    previous one (orbax enforces one outstanding commit)."""
    payload = {"state": state, "frozen": frozen, "epoch": epoch}
    if async_save:
        _async_ckptr().save(os.path.abspath(path), payload, force=True)
    else:
        _ckptr().save(os.path.abspath(path), payload, force=True)


def wait_for_async_saves() -> None:
    """Block until any in-flight async save has committed (call before
    reading the checkpoint back or at process exit)."""
    if _ASYNC is not None:
        _ASYNC.wait_until_finished()


def restore(path: str, template_state: TrainState,
            template_frozen: Any) -> Tuple[TrainState, Any, int]:
    """Full training restore (--resume, main.py:491-531)."""
    payload = _ckptr().restore(
        os.path.abspath(path),
        item={"state": template_state, "frozen": template_frozen, "epoch": 0})
    return payload["state"], payload["frozen"], int(payload["epoch"])


def load_params(path: str, prefer_ema: bool = True) -> Tuple[Any, Any]:
    """Weights-only warm start (--load, main.py:456-473: EMA key preferred).

    Returns (params, frozen)."""
    payload = _ckptr().restore(os.path.abspath(path))
    state = payload["state"]
    params = state.get("ema_params") if prefer_ema else None
    if params is None:
        params = state["params"]
    return params, payload["frozen"]


def merge_params(init_tree: Any, loaded_tree: Any) -> Any:
    """Overlay loaded params onto a (possibly larger) initialized tree.

    The reference's --frozen_weights loads a detection checkpoint into the
    `.detr` submodule of the seg model (main.py:475-489): the mask head keeps
    its fresh init. Keys present in both must match shapes; keys only in the
    init tree are kept; keys only in the checkpoint are ignored (e.g. dropping
    contrastive projections when the target model disables them)."""
    if isinstance(init_tree, dict):
        out = {}
        for k, v in init_tree.items():
            if isinstance(loaded_tree, dict) and k in loaded_tree:
                out[k] = merge_params(v, loaded_tree[k])
            else:
                out[k] = v
        return out
    import numpy as np
    loaded = loaded_tree
    if hasattr(init_tree, "shape") and hasattr(loaded, "shape"):
        if tuple(init_tree.shape) != tuple(loaded.shape):
            raise ValueError(
                f"shape mismatch merging checkpoint: {loaded.shape} vs "
                f"{init_tree.shape}")
    return loaded
