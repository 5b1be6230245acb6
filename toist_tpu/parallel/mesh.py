"""Device mesh + sharding helpers.

The reference's only parallelism is data parallelism via DDP (SURVEY.md §2.2); here
that is a 1-D ('data',) jax.sharding.Mesh: batches shard on 'data', parameters are
replicated, XLA inserts the gradient psum over ICI. Optimizer state can optionally
shard over 'data' (ZeRO-1-ish, RunConfig.shard_opt_state).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape=(-1,), axes=("data",),
              devices: Optional[list] = None) -> Mesh:
    devs = np.array(devices if devices is not None else jax.devices())
    shape = list(mesh_shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = len(devs) // known
    total = int(np.prod(shape))
    if total > len(devs):
        raise ValueError(f"mesh {shape} needs {total} devices, have {len(devs)}")
    return Mesh(devs[:total].reshape(shape), axes)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Host numpy batch (possibly nested, e.g. distillation {noun, sth}) ->
    device arrays sharded on the data axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda v: jax.device_put(v, sh), batch)


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)


def prefetch_to_device(iterator, mesh: Optional[Mesh], size: int = 2):
    """Wrap a host batch iterator with async device placement.

    device_put dispatches asynchronously; keeping `size` batches in flight
    overlaps host->device transfer with the running step. Without this, each
    step pays the full batch transfer latency (measured 1.2s/step on the
    tunneled TPU vs 0.2s compute).
    """
    import collections

    queue = collections.deque()

    def put(b):
        return shard_batch(b, mesh) if mesh is not None else \
            jax.tree_util.tree_map(jax.device_put, b)

    for batch in iterator:
        queue.append(put(batch))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
