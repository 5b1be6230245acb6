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
        # Print the device op breakdown right away (the trace is also left on
        # disk for TensorBoard/XProf). Times are totals over the traced span.
        try:
            from toist_tpu.utils import xprof
            s = xprof.summarize_trace(logdir)
            print(f"[profile] device total {s['device_ms_per_iter']:.0f}ms; "
                  "top op categories: " +
                  ", ".join(f"{n} {ms:.0f}ms ({p}%)"
                            for n, ms, p in s["categories"][:6]), flush=True)
        except Exception as e:
            print(f"[profile] trace written to {logdir} "
                  f"(summary unavailable: {e})", flush=True)


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
