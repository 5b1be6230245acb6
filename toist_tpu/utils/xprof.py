"""TPU profile analysis: parse jax.profiler XSpace traces into op breakdowns.

The reference ships no profiler tooling at all (SURVEY.md §5.1 — it has
TensorBoard scalars only); on TPU the actionable signal is the per-HLO-op
time in the XLA trace. ``jax.profiler.trace`` writes an ``*.xplane.pb``
XSpace protobuf; the TensorBoard profile plugin in this image cannot convert
it (binary/protobuf version skew), so this module carries the public XPlane
schema (``xplane.proto``, regenerate with ``protoc --python_out=. ``) and
aggregates the device "XLA Ops" line directly.

Used by bench.py (profile-derived op breakdown in BENCH_r*.json) and
available for ad-hoc use:

    with jax.profiler.trace("/tmp/prof"):
        run_steps()
    print(toist_tpu.utils.xprof.summarize_trace("/tmp/prof", iters=3))
"""
from __future__ import annotations

import collections
import glob
import os
import re
from typing import Dict, List, Optional, Tuple


def _load_xspace(trace_dir: str):
    from toist_tpu.utils import xplane_pb2

    paths = sorted(glob.glob(
        os.path.join(trace_dir, "plugins", "profile", "*", "*.xplane.pb")))
    if not paths:
        raise FileNotFoundError(f"no *.xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def _op_category(hlo_name: str) -> str:
    """HLO instruction name -> coarse category (fusion kind / op kind)."""
    m = re.match(r"%?([a-zA-Z\-_]+)", hlo_name)
    return m.group(1) if m else hlo_name


def summarize_trace(trace_dir: str, iters: int = 1,
                    device_substr: str = "TPU",
                    top_n: int = 10) -> Dict[str, object]:
    """Aggregate the device XLA-op line of the newest trace under trace_dir.

    Returns {"device_ms_per_iter", "categories": [(name, ms, pct)...],
    "top_ops": [(hlo_name, ms)...]} with times divided by ``iters`` (the
    number of steps captured inside the trace).
    """
    xs = _load_xspace(trace_dir)
    plane = None
    for p in xs.planes:
        if device_substr in p.name:
            plane = p
            break
    if plane is None:
        # Fall back to the busiest compute plane (CPU runs put XLA op events
        # under "/host:CPU" rather than a "/device:" plane).
        candidates = [p for p in xs.planes
                      if (p.name.startswith("/device:")
                          or p.name == "/host:CPU")
                      and any(ln.events for ln in p.lines)]
        if candidates:
            plane = max(candidates,
                        key=lambda p: sum(len(ln.events) for ln in p.lines))
    if plane is None:
        raise ValueError(
            f"no plane matching {device_substr!r}; have "
            f"{[p.name for p in xs.planes]}")
    md = plane.event_metadata
    op_lines = [ln for ln in plane.lines if ln.name == "XLA Ops"]
    if not op_lines:  # fall back to the densest line
        op_lines = [max(plane.lines, key=lambda ln: len(ln.events))]
    agg: collections.Counter = collections.Counter()
    cat: collections.Counter = collections.Counter()
    for ev in op_lines[0].events:
        name = md[ev.metadata_id].name
        agg[name] += ev.duration_ps
        cat[_op_category(name)] += ev.duration_ps
    total_ps = sum(agg.values())
    to_ms = lambda ps: ps / 1e9 / iters
    return {
        "device_ms_per_iter": round(to_ms(total_ps), 3),
        "categories": [
            (name, round(to_ms(ps), 3),
             round(100.0 * ps / max(total_ps, 1), 1))
            for name, ps in cat.most_common(top_n)],
        "top_ops": [(name, round(to_ms(ps), 3))
                    for name, ps in agg.most_common(top_n)],
    }


def profile_fn(fn, trace_dir: str, iters: int = 3) -> Dict[str, object]:
    """Run ``fn()`` ``iters`` times under jax.profiler.trace and summarize."""
    import jax

    fn()  # warmup outside the trace
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out) if out is not None else None
    return summarize_trace(trace_dir, iters=iters)
