#!/usr/bin/env python
"""Standalone microbench of the fused attention kernel at flagship shapes.

Directive r4 #5 follow-up: at batch 16 the pallas attention custom-calls are
~30.7 ms of the 207 ms detection train step (docs/prof_dete_b16_r5.json)
while running at only ~29% attained HBM — neither bandwidth- nor MXU-bound
on padded-lane arithmetic. This isolates the kernel (encoder shape: B*H=128
grid rows, S=1116 padded to 1152 keys at 128-lane granularity, head dim 32
padded to 128 lanes) and times forward and forward+backward at eval
(dropout 0) and train (dropout 0.1) settings so kernel changes can be A/B'd
without a full-step recompile. The round-5 kernel rewrite measured here:
128-granularity key padding + per-shape q-tile (1280->1152 padded rows),
exp2 log2-space scores, deferred softmax division and deferred backward
sm_scale — fwd 1.62 -> 1.23 ms, train fwd+bwd 3.11 -> 2.44 ms at the
default (auto) tiles bq=576/bk=384.

Each timing runs ITERS calls inside ONE jitted lax.scan (chained through
lax.optimization_barrier), because this VM's ~25 ms/step host dispatch
would otherwise swamp a ~2 ms kernel (CLAUDE.md).

Usage: python scripts/bench_attention.py [--block N] [--iters N]
Prints one JSON line. TPU-exclusive (one process at a time).
"""
from __future__ import annotations

import argparse
import functools
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--B", type=int, default=16)
    p.add_argument("--H", type=int, default=8)
    p.add_argument("--S", type=int, default=1116)  # 26*42 img tokens + 24 text
    p.add_argument("--D", type=int, default=256)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--bq", type=int, default=0,
                   help="force flash_attention q-tile (0 = per-shape choice)")
    p.add_argument("--bk", type=int, default=0,
                   help="force flash_attention dkv k-tile (0 = per-shape)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from toist_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    from toist_tpu.ops import flash_attention as fa
    if args.bq:
        fa._FORCE_BQ = args.bq
    if args.bk:
        fa._FORCE_BK = args.bk

    B, H, S, D = args.B, args.H, args.S, args.D
    key = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(kk, (B, S, D), jnp.bfloat16)
               for kk in jax.random.split(key, 3))
    mask = np.zeros((B, S), bool)
    mask[B // 2:, -24:] = True          # realistic per-sample key padding
    mask = jnp.asarray(mask)
    seed = jnp.asarray([0], jnp.int32)
    n = args.iters

    def timed(step):
        """step: q -> array shaped like q. Scanned n times inside one jit.

        The carry must be the OUTPUT (not a reset to q0): with a constant
        carry the body is loop-invariant and XLA elides iterations — the
        first version of this harness measured fwd+bwd FASTER than fwd.
        Attention outputs are convex combinations of v rows (and dq of a
        sum-loss is similarly bounded), so chaining values stays finite.
        """
        @jax.jit
        def loop(q0):
            def body(carry, _):
                out = step(carry)
                return jax.lax.optimization_barrier(out), ()
            final, _ = jax.lax.scan(body, q0, None, length=n)
            return final
        np.asarray(loop(q)[0, 0, 0])    # compile + warm
        t0 = time.time()
        np.asarray(loop(q)[0, 0, 0])
        return (time.time() - t0) / n * 1e3

    def fwd(drop):
        def step(qq):
            return fa.fused_attention(
                qq, k, v, mask, H, dropout_rate=drop,
                deterministic=drop == 0.0,
                seed=None if drop == 0.0 else seed)
        return step

    def fwdbwd(drop):
        def loss(qq):
            return fwd(drop)(qq).astype(jnp.float32).sum()
        return jax.grad(lambda qq: loss(qq))

    bq = args.bq or fa._choose_bq(S)
    Sp = math.ceil(S / fa._LANE) * fa._LANE
    results = {"B": B, "H": H, "S": S, "D": D,
               "bq": bq, "bk": args.bk or fa._choose_bk(Sp),
               "Sqp": math.ceil(S / bq) * bq, "Sp": Sp, "iters": n}
    results["fwd_ms_dropout0"] = round(timed(fwd(0.0)), 3)
    results["fwd_ms_dropout01"] = round(timed(fwd(0.1)), 3)
    results["fwdbwd_ms_dropout0"] = round(timed(fwdbwd(0.0)), 3)
    results["fwdbwd_ms_dropout01"] = round(timed(fwdbwd(0.1)), 3)

    # Roofline context for the padded-lane arithmetic (per fwd call).
    Sqp = results["Sqp"]
    flops_pad = 4 * B * H * Sqp * Sp * 128          # QK^T + PV at hd_pad=128
    flops_true = 4 * B * H * S * S * (D // H)
    results["mxu_ideal_ms_padded_fwd"] = round(flops_pad / 197e12 * 1e3, 3)
    results["mxu_ideal_ms_true_fwd"] = round(flops_true / 197e12 * 1e3, 3)
    hbm_gb = 4 * B * H * Sp * 128 * 2 / 1e9         # q,k,v,o padded bf16
    results["hbm_ideal_ms_padded_fwd"] = round(hbm_gb / 819 * 1e3, 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
