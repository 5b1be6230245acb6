"""Pallas TPU kernel for the exact linear-sum-assignment solver.

Same algorithm and semantics as ops/lsa.py (shortest augmenting path with dual
potentials, scipy-equivalent optima), but the entire sequential solve runs inside one
Pallas kernel per batch element: the cost matrix, dual potentials, and scan state stay
resident in VMEM for all ~R*(R+1) sequential relaxation steps instead of bouncing
through HBM between XLA while-loop iterations. Matching is the hottest non-conv op of
the train step (6 calls/step), so this is the framework's Pallas showcase
(/opt/skills/guides/pallas_guide.md patterns: grid over batch, scalar prefetch,
while/fori control flow, masked argmin, 2D iota).

Interface mirrors ops/lsa.py: cost [B, R, C] (R <= C), n_rows [B] -> col4row [B, R]
(-1 for padded rows). Columns are padded to a lane multiple inside the wrapper.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30
# Reachability cutoff: tentative distances >= _CUT mean "no unscanned column
# is reachable" (only pad columns / non-finite-sanitized entries live up
# there). The scan exits instead of accepting such a column — with NaN costs
# nothing ever relaxes `shortest`, the masked argmin re-picks an
# already-scanned column, and the while_loop would otherwise spin forever
# (same failure mode fixed in ops/lsa.py; seen live with a random-weight
# checkpoint whose eval losses produced NaN cost rows).
_CUT = 5e29


def _kernel(n_rows_ref, cost_ref, out_ref):
    """One batch element: cost block [1, R, C] VMEM; n_rows [B] prefetched."""
    _, R, C = cost_ref.shape
    b = pl.program_id(0)
    n_rows = n_rows_ref[b]
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)

    def augment(cur_row, state):
        u, v, row4col, col4row = state
        # u [1,R] f32, v [1,C] f32, row4col [1,C] i32, col4row [1,R] i32

        def scan_cond(s):
            _i, minval, sink, _sr, _sc, _short, _path = s
            return (sink < 0) & (minval < _CUT)

        def scan_body(s):
            # sr/sc are int32 0/1 masks: Mosaic cannot unify the layouts of
            # boolean while-loop carries across iterations.
            i, minval, sink, sr, sc, shortest, path = s
            sr = sr | (row_iota == i).astype(jnp.int32)
            cost_i = cost_ref[0, pl.ds(i, 1), :]                  # [1, C]
            u_i = jnp.sum(jnp.where(row_iota == i, u, 0.0))
            r = minval + cost_i - u_i - v
            better = (sc == 0) & (r < shortest)
            path = jnp.where(better, i, path)
            shortest = jnp.where(better, r, shortest)
            masked = jnp.where(sc > 0, _BIG, shortest)            # [1, C]
            j = jnp.argmin(masked[0])
            minval = jnp.min(masked)
            sc = sc | (col_iota == j).astype(jnp.int32)
            # owner = row4col[0, j] via masked sum (others contribute 0).
            owner = jnp.sum(jnp.where(col_iota == j, row4col, jnp.int32(0)))
            # Unreachable columns (minval >= _CUT: pads, or the all-_BIG
            # no-progress state under sanitized non-finite costs) are never
            # accepted as sinks — scan_cond exits on them instead.
            free = (owner < 0) & (minval < _CUT)
            sink = jnp.where(free, j, jnp.int32(-1))
            i = jnp.where(free, i, owner)
            return (i, minval, sink, sr, sc, shortest, path)

        init = (cur_row, jnp.float32(0.0), jnp.int32(-1),
                (row_iota < 0).astype(jnp.int32),
                (col_iota < 0).astype(jnp.int32),
                jnp.where(col_iota < 0, 0.0, _BIG).astype(jnp.float32),
                jnp.where(col_iota < 0, 0, -1).astype(jnp.int32))
        i, minval, sink, sr, sc, shortest, path = jax.lax.while_loop(
            scan_cond, scan_body, init)

        def apply(args):
            u, v, row4col, col4row = args
            # Dual update. gathered[r] = shortest[col4row[r]]; Mosaic has no
            # general gather, so use a one-hot masked sum over a [R, C] mask.
            u2 = jnp.where(row_iota == cur_row, u + minval, u)
            other = (sr > 0) & (row_iota != cur_row)
            col_of_row = jnp.clip(col4row, 0, C - 1)              # [1, R]
            match = col_of_row.reshape(R, 1) == col_iota          # [R, C]
            gathered = jnp.sum(jnp.where(match, shortest, 0.0),
                               axis=1).reshape(1, R)
            u2 = jnp.where(other, u2 + minval - gathered, u2)
            v2 = jnp.where(sc > 0, v - (minval - shortest), v)

            # Augment along predecessor path (`hops` backstop as in lsa.py).
            def aug_cond(s):
                _j, _r4c, _c4r, done, hops = s
                return ~done & (hops <= R)

            def aug_body(s):
                j, row4col, col4row, _done, hops = s
                i2 = jnp.sum(jnp.where(col_iota == j, path, jnp.int32(0)))
                row4col = jnp.where(col_iota == j, i2, row4col)
                prev_j = jnp.sum(jnp.where(row_iota == i2, col4row,
                                           jnp.int32(0)))
                col4row = jnp.where(row_iota == i2, j, col4row)
                return (prev_j, row4col, col4row, i2 == cur_row, hops + 1)

            _, row4col, col4row, _, _ = jax.lax.while_loop(
                aug_cond, aug_body,
                (sink, row4col, col4row, jnp.bool_(False), jnp.int32(0)))
            return (u2, v2, row4col, col4row)

        # sink < 0: no reachable free column (non-finite costs that slipped
        # past the wrapper's sanitizer) — leave cur_row unassigned rather
        # than corrupt the duals.
        return jax.lax.cond(sink >= 0, apply, lambda a: a,
                            (u, v, row4col, col4row))

    def body(row, state):
        return jax.lax.cond(row < n_rows, lambda s: augment(row, s),
                            lambda s: s, state)

    init = (jnp.zeros((1, R), jnp.float32), jnp.zeros((1, C), jnp.float32),
            jnp.full((1, C), -1, jnp.int32), jnp.full((1, R), -1, jnp.int32))
    _, _, _, col4row = jax.lax.fori_loop(0, R, body, init)
    out_ref[...] = col4row[None]  # out block [1, 1, R]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def solve_lsa_batch_pallas(cost: jnp.ndarray, n_rows: jnp.ndarray,
                           interpret: bool = False) -> jnp.ndarray:
    """cost [B, R, C] f32 (R <= C), n_rows [B] -> col4row [B, R] int32."""
    B, R, C = cost.shape
    if R > C:
        raise ValueError(f"need R <= C, got {cost.shape}")
    # Sanitize non-finite costs to a finite sentinel larger than any
    # all-finite assignment (and far below the pad/_CUT band), mirroring
    # ops/lsa.py: the solve terminates and avoids such entries whenever a
    # finite assignment exists.
    finite = jnp.isfinite(cost)
    big = (jnp.max(jnp.where(finite, jnp.abs(cost), 0.0),
                   axis=(1, 2), keepdims=True) + 1.0) * (R + 1)
    cost = jnp.where(finite, cost, big)
    Cp = _round_up(C, 128)
    if Cp != C:
        # Padded columns carry a huge cost: never chosen while real columns
        # remain, and with R <= C real columns always suffice.
        pad = jnp.full((B, R, Cp - C), _BIG, cost.dtype)
        cost = jnp.concatenate([cost, pad], axis=-1)

    out = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[pl.BlockSpec((1, R, Cp), lambda b, *_: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            # Output as [B, 1, R] so the block's trailing dims equal the
            # array dims (Mosaic's (sublane, lane) divisibility rule).
            out_specs=pl.BlockSpec((1, 1, R), lambda b, *_: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((B, 1, R), jnp.int32),
        interpret=interpret,
    )(n_rows.astype(jnp.int32), cost.astype(jnp.float32))
    out = out[:, 0, :]
    # Padded-row slots -> -1 (parity with ops/lsa.py).
    row_ids = jnp.arange(R)[None, :]
    return jnp.where(row_ids < n_rows[:, None], out, -1)
