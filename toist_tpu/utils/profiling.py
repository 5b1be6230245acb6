"""Profiling utilities (SURVEY.md §5.1: the jax.profiler equivalent of the
reference's MetricLogger timing + torch.cuda.max_memory_allocated).
"""
from __future__ import annotations

import contextlib
import os
from typing import Optional


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """Capture a jax profiler trace (viewable in TensorBoard/XProf) if logdir."""
    import jax

    if not logdir:
        yield
        return
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> dict:
    """Best-effort live/peak device memory (the max_memory_allocated analogue)."""
    import jax

    out = {}
    for d in jax.local_devices():
        try:
            stats = d.memory_stats()
        except Exception:
            continue
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            }
    return out
