"""Device mesh + sharding helpers.

The reference's only parallelism is data parallelism via DDP (SURVEY.md §2.2); here
that is a 1-D ('data',) jax.sharding.Mesh: batches shard on 'data', parameters are
replicated, XLA inserts the gradient psum over ICI. Optimizer state can optionally
shard over 'data' (ZeRO-1-ish, RunConfig.shard_opt_state). A 2-D
('data', 'model') mesh adds tensor parallelism via parameter placement
(parallel/tp.py); the ZeRO-1 specs below compose with the TP axis.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
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
    device arrays sharded on the data axis.

    Multi-process (jax.distributed): each process holds only ITS data shard
    (BatchIterator slices per process, the DistributedSampler equivalent), so
    the global array is assembled from per-process local rows — the GLOBAL
    batch dim is local_batch * process_count. Single-process: plain
    device_put (the value is the whole batch)."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda v: jax.make_array_from_process_local_data(
                sh, np.asarray(v)), batch)
    return jax.tree_util.tree_map(lambda v: jax.device_put(v, sh), batch)


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    """Place every leaf replicated over the mesh, with OWNED buffers.

    device_put may alias the source buffer for the shard already resident on
    the source device; the train step donates its input state, so an aliased
    replica would be deleted together with the original. Copying under ONE
    jit forces fresh buffers for the whole tree in a single dispatch —
    per-leaf eager jnp.copy costs ~0.5s/op on the tunneled platform, which
    over a flagship TrainState's hundreds of leaves would add minutes at
    startup.
    """
    rep = replicated(mesh)
    if jax.process_count() > 1:
        # Multi-process: the jit-copy trick can't consume process-local
        # committed arrays. Every process holds the full value (deterministic
        # init / shared checkpoint), so pull to host and device_put the
        # global value — always fresh buffers, no aliasing.
        host = jax.device_get(tree)
        return jax.tree_util.tree_map(
            lambda v: jax.device_put(np.asarray(v), rep), host)
    tree = jax.tree_util.tree_map(jnp.asarray, tree)
    return jax.jit(
        lambda t: jax.tree_util.tree_map(jnp.copy, t),
        out_shardings=rep)(tree)


def _zero1_spec(x: Any, n: int, min_size: int, base: P = P()) -> P:
    """ZeRO-1 leaf spec: shard the largest n-divisible FREE axis over 'data'.

    Small leaves (and schedule counters etc.) stay replicated — sharding them
    would cost a collective per step for no memory win. `base` carries the
    tensor-parallel spec of the mirrored parameter (parallel/tp.py): moments
    keep their 'model' axis and ZeRO-1 picks among the remaining axes, so
    the two shardings compose (e.g. an FFN kernel moment [D, F] becomes
    P('data', 'model'))."""
    shape = getattr(x, "shape", ())
    spec = list(base) + [None] * (len(shape) - len(base))
    if not shape or int(np.prod(shape)) < min_size:
        return P(*spec) if any(s is not None for s in spec) else P()
    best_axis, best_dim = -1, 0
    for i, d in enumerate(shape):
        if spec[i] is None and d % n == 0 and d > best_dim:
            best_axis, best_dim = i, d
    if best_axis >= 0:
        spec[best_axis] = "data"
    if not any(s is not None for s in spec):
        return P()
    return P(*spec)


def _opt_state_specs(opt_state: Any, mesh: Mesh, min_size: int) -> Any:
    """Leaf -> PartitionSpec for the optimizer state, composing ZeRO-1 with
    the TP policy. Moment trees mirror the parameter tree, so the TP policy
    (which matches on the trailing (parent, name) path) applies to their
    paths directly; non-mirrored leaves (schedule counts) fall through to
    P()."""
    from toist_tpu.parallel import tp as tp_lib

    n = mesh.shape["data"]
    if tp_lib.has_model_axis(mesh):
        ntp = mesh.shape[tp_lib.MODEL_AXIS]

        def spec(path, x):
            base = tp_lib.tp_spec(tp_lib._path_names(path), x, ntp)
            return _zero1_spec(x, n, min_size, base)
        return jax.tree_util.tree_map_with_path(spec, opt_state)
    return jax.tree_util.tree_map(
        lambda x: _zero1_spec(x, n, min_size), opt_state)


def shard_opt_state(opt_state: Any, mesh: Mesh, min_size: int = 2 ** 12) -> Any:
    """Place optimizer-state leaves ZeRO-1 style: first/second AdamW moments
    sharded over the 'data' axis (reference has no analogue — torch keeps a
    full optimizer replica per rank, main.py:387-392; sharding is nearly free
    under pjit and cuts opt-state HBM by ~1/n_devices)."""
    from toist_tpu.parallel import tp as tp_lib

    n = mesh.shape["data"]
    if n <= 1 and not tp_lib.has_model_axis(mesh):
        return replicate_tree(opt_state, mesh)
    specs = _opt_state_specs(opt_state, mesh, min_size)
    if jax.process_count() > 1:
        # Cross-process placement needs the full global value on every
        # process (it is: init is deterministic / checkpoints are shared).
        opt_state = jax.device_get(opt_state)
        opt_state = jax.tree_util.tree_map(np.asarray, opt_state)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        opt_state, specs)


def constrain_opt_state(opt_state: Any, mesh: Optional[Mesh],
                        min_size: int = 2 ** 12) -> Any:
    """with_sharding_constraint version of shard_opt_state, for use INSIDE the
    jitted train step: pins the updated moments to the ZeRO-1 layout so the
    sharding is stable across steps (no silent re-replication by the
    propagation pass)."""
    if mesh is None:
        return opt_state
    from toist_tpu.parallel import tp as tp_lib

    n = mesh.shape["data"]
    if n <= 1 and not tp_lib.has_model_axis(mesh):
        return opt_state
    specs = _opt_state_specs(opt_state, mesh, min_size)
    return jax.tree_util.tree_map(
        lambda x, s: jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, s)), opt_state, specs)


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
