"""Micro-benchmark: batched Hungarian matching, XLA solver vs Pallas kernel.

Measures hungarian_match_levels at the flagship train shape (L=6 decoder
levels x batch 6, Q=100 queries, T=25 target slots) under both backends and
prints one JSON line. The winner is recorded in COMPONENTS.md and is the
default backend (TOIST_LSA_BACKEND env var overrides).

Run:  python scripts/bench_matching.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(backend: str, L=6, B=6, Q=100, T=25, C=256, iters=20) -> float:
    os.environ["TOIST_LSA_BACKEND"] = backend
    import jax
    import jax.numpy as jnp
    import numpy as np

    from toist_tpu.ops.matching import hungarian_match_levels

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(L, B, Q, C)), jnp.float32)
    pboxes = jnp.asarray(rng.uniform(0.1, 0.9, (L, B, Q, 4)), jnp.float32)
    tboxes = jnp.asarray(rng.uniform(0.2, 0.8, (B, T, 4)), jnp.float32)
    pm = jnp.asarray(rng.uniform(0, 1, (B, T, C)), jnp.float32)
    tv = jnp.asarray(rng.uniform(0, 1, (B, T)) < 0.6)

    @jax.jit
    def run(logits, chain):
        t2q = hungarian_match_levels(logits + chain * 1e-30, pboxes, tboxes,
                                     pm, tv)
        return t2q, t2q.astype(jnp.float32).ravel()[0]

    chain = jnp.float32(0.0)
    t2q, chain = run(logits, chain)
    np.asarray(t2q)  # compile + sync
    t0 = time.time()
    for _ in range(iters):
        t2q, chain = run(logits, chain)
    np.asarray(t2q)
    return (time.time() - t0) / iters * 1e3


def main():
    xla_ms = measure("xla")
    pallas_ms = measure("pallas")
    print(json.dumps({
        "shape": "L6xB6 Q100 T25 C256",
        "xla_ms": round(xla_ms, 3),
        "pallas_ms": round(pallas_ms, 3),
        "winner": "xla" if xla_ms <= pallas_ms else "pallas",
    }))


if __name__ == "__main__":
    main()
