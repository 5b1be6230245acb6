"""Tensor parallelism: Megatron-style parameter placement over a 2-D mesh.

The reference scales only by data parallelism (DDP over 6 GPUs, SURVEY.md
§2.2). On TPU the natural next axis is tensor parallelism over ICI: a 2-D
``Mesh((dp, tp), ('data', 'model'))`` where every attention and FFN weight
of the joint transformer and the text encoder is sharded over 'model' in
the classic column-then-row pattern:

  * q/k/v projections + FFN first linear: kernel [D, F] -> P(None, 'model')
    (column parallel; each shard owns H/tp heads / F/tp hidden units, bias
    sharded alike);
  * output projection + FFN second linear: kernel [F, D] -> P('model', None)
    (row parallel; bias replicated — it is added once after the reduce).

Under pjit/GSPMD this is PLACEMENT ONLY: the model code stays the plain
flax modules (models/layers.py), XLA's sharding propagation partitions the
intermediate activations head-wise and inserts exactly one all-reduce after
each row-parallel matmul (the Megatron f/g collectives), riding ICI. The
fused Pallas attention participates through its shard_map wrapper, which
splits heads across 'model' (ops/flash_attention.py).

Everything not matched by the policy (backbone convs, embeddings, norms,
heads) stays replicated; batches shard over 'data' only. Composition with
ZeRO-1 optimizer sharding is handled in parallel/mesh.py: moment leaves
keep their TP axis and the largest remaining axis shards over 'data'.

Enable by configuring ``run.mesh_shape=(-1, tp)``,
``run.mesh_axes=('data', 'model')``; `main.py` switches parameter
placement to `shard_params` whenever the mesh has a >1 'model' axis.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"

# (parent module, param name) -> sharded axis position for 2-D kernels /
# 1-D biases. Column-parallel producers shard their OUTPUT features; the
# row-parallel consumers shard their INPUT features.
_COLUMN_PARENTS = ("q_proj", "k_proj", "v_proj",  # attention projections
                   "linear1",                     # joint-transformer FFN in
                   "intermediate")                # RoBERTa FFN in
_ROW_PARENTS = ("out_proj",                       # attention output
                "linear2",                        # joint-transformer FFN out
                "output")                         # RoBERTa FFN out


def has_model_axis(mesh: Optional[Mesh]) -> bool:
    return (mesh is not None and MODEL_AXIS in mesh.axis_names
            and mesh.shape[MODEL_AXIS] > 1)


def tp_spec(path_names: Tuple[str, ...], leaf: Any,
            tp: int) -> P:
    """Partition spec for one parameter leaf given its tree path.

    Matches on the (parent-module, leaf-name) tail so the policy applies
    uniformly to the joint encoder/decoder (self_attn / cross_attn_image /
    ffn) and the RoBERTa stack; anything unmatched — or not divisible by
    the axis size — is replicated."""
    if len(path_names) < 2:
        return P()
    parent, name = path_names[-2], path_names[-1]
    shape = getattr(leaf, "shape", ())
    if parent in _COLUMN_PARENTS:
        if name == "kernel" and len(shape) == 2 and shape[1] % tp == 0:
            return P(None, MODEL_AXIS)
        if name == "bias" and len(shape) == 1 and shape[0] % tp == 0:
            return P(MODEL_AXIS)
    elif parent in _ROW_PARENTS:
        # Row-parallel bias stays replicated: the bias is added once to the
        # all-reduced output, not per shard.
        if name == "kernel" and len(shape) == 2 and shape[0] % tp == 0:
            return P(MODEL_AXIS, None)
    return P()


def _path_names(path) -> Tuple[str, ...]:
    names = []
    for entry in path:
        key = getattr(entry, "key", None)
        if key is None:
            key = getattr(entry, "name", None)
        if key is None:
            idx = getattr(entry, "idx", None)
            key = str(idx) if idx is not None else str(entry)
        names.append(str(key))
    return tuple(names)


def param_spec_tree(params: Any, mesh: Mesh) -> Any:
    """PartitionSpec per leaf of a parameter tree under the TP policy."""
    tp = mesh.shape[MODEL_AXIS]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: tp_spec(_path_names(path), leaf, tp), params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a parameter tree on the mesh: TP-policy leaves sharded over
    'model', the rest replicated (over the whole mesh). Copies under one jit
    like parallel.mesh.replicate_tree (owned buffers for donation safety,
    single dispatch)."""
    specs = param_spec_tree(params, mesh)
    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return jax.jit(
        lambda t: jax.tree_util.tree_map(jnp.copy, t),
        out_shardings=shardings)(params)


def constrain_params(params: Any, mesh: Optional[Mesh]) -> Any:
    """with_sharding_constraint version of shard_params for use INSIDE the
    jitted train step: pins updated params (and EMA) to the TP layout so the
    placement survives the optimizer update without re-propagation drift."""
    if not has_model_axis(mesh):
        return params
    specs = param_spec_tree(params, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, s)), params, specs)
