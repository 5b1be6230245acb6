"""Exact linear-sum-assignment on device, in JAX.

The reference solves Hungarian matching on the host with
``scipy.optimize.linear_sum_assignment`` after a device->host copy
(/root/reference/models/matcher.py:82-85), once per image per decoder layer (6 calls per
step). Here the same exact algorithm — shortest-augmenting-path with dual potentials, the
method scipy implements — runs inside the compiled step with static shapes, so matching
costs no host round-trip and stays fused into the train step.

Shapes are static: ``cost`` is [R, C] with R <= C; only the first ``n_rows`` rows are
assigned (rows beyond ``n_rows`` are padding and get assignment -1). All loops are bounded:
the Dijkstra scan terminates after at most R+1 column removals (path length through matched
columns), and the augmentation backtrack after at most R+1 hops.

Optimality is exact (same objective as scipy); on *tied* optima the chosen assignment may
differ from scipy's, which matters only for bitwise-parity tests (ties are measure-zero for
continuous costs). Verified against scipy on random and adversarial matrices in
tests/test_lsa.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# NB: keep module-level constants as Python floats, never jnp arrays — a module-level
# device array becomes an MLIR constant whose value fetch can block on backend transfer
# for a very long time on remote-device platforms.
_INF = float("inf")


def _augment_one(cost, u, v, row4col, col4row, cur_row, do):
    """Find and apply one augmenting path starting at ``cur_row``.

    cost: [R, C] f32. u: [R], v: [C] potentials. row4col: [C] i32 (col -> row or -1).
    col4row: [R] i32 (row -> col or -1). Returns updated (u, v, row4col, col4row).

    ``do`` (traced bool) gates the whole phase: when False both inner loops
    exit at iteration 0 and the state passes through unchanged. This matters
    under vmap: ``lax.cond`` with a batched predicate lowers to select-of-
    both-branches, so guarding a phase with ``cond(row < n_rows, ...)`` still
    PAYS the full Dijkstra for every lane — the pre-round-5 implementation
    did exactly that for padded rows. An in-loop early exit is the only way
    a lane skips work inside a batched while.
    """
    R, C = cost.shape
    row_iota = jnp.arange(R)
    col_iota = jnp.arange(C)

    # Dijkstra over columns. SC = scanned (removed) columns; SR = scanned rows.
    # All state updates are one-hot jnp.where (no scatters): scatters inside
    # vmapped while_loops compile pathologically slowly on XLA.
    def scan_cond(state):
        _i, minval, sink, *_ = state
        # Terminate on a found sink, or when no unscanned column is reachable
        # (minval == +inf). The latter bounds the loop unconditionally: every
        # iteration with finite minval scans one NEW column, so after at most
        # C productive iterations all unscanned tentative distances are +inf.
        # With finite costs a sink always appears first; non-finite costs
        # (NaN/inf never relax `shortest`) would otherwise re-pick an
        # already-scanned column via argmin and spin the chip forever — seen
        # live with a random-weight checkpoint whose eval losses produced NaN
        # cost rows. solve_lsa sanitizes those, this is the backstop.
        return (sink < 0) & jnp.isfinite(minval)

    def scan_body(state):
        i, minval, sink, sr, sc, shortest, path = state
        sr = sr | (row_iota == i)
        # Relax all unscanned columns from row i.
        r = minval + cost[i] - u[i] - v
        better = (~sc) & (r < shortest)
        path = jnp.where(better, i, path)
        shortest = jnp.where(better, r, shortest)
        # Pick the unscanned column with the smallest tentative distance.
        masked = jnp.where(sc, _INF, shortest)
        j = jnp.argmin(masked)
        minval = masked[j]
        sc = sc | (col_iota == j)
        # An infinite minval means j is unreachable (argmin over all-inf);
        # never accept it as a sink — path[j] would be -1 and the augment
        # backtrack would walk garbage. scan_cond exits on it instead.
        free = (row4col[j] < 0) & jnp.isfinite(minval)
        sink = jnp.where(free, j, -1)
        i = jnp.where(free, i, row4col[j])
        return (i, minval, sink, sr, sc, shortest, path)

    init = (
        cur_row,
        jnp.float32(0.0),
        # sink >= 0 at entry = the scan loop never runs for a gated-off lane.
        jnp.where(do, jnp.int32(-1), jnp.int32(0)),
        jnp.zeros((R,), bool),
        jnp.zeros((C,), bool),
        jnp.full((C,), _INF),
        jnp.full((C,), -1, jnp.int32),
    )
    i, minval, sink, sr, sc, shortest, path = jax.lax.while_loop(
        scan_cond, scan_body, init)

    def apply(args):
        u, v, row4col, col4row = args
        # Dual update (scipy _lsap.c semantics).
        u2 = jnp.where(row_iota == cur_row, u + minval, u)
        other = sr & (row_iota != cur_row)
        # col4row[i] is valid for every scanned row other than cur_row.
        gathered = jnp.where(other, shortest[jnp.clip(col4row, 0, C - 1)],
                             0.0)
        u2 = jnp.where(other, u2 + minval - gathered, u2)
        v2 = jnp.where(sc, v - (minval - shortest), v)

        # Augment: walk predecessors from the sink back to cur_row. Bounded
        # by construction (the predecessor chain alternates distinct matched
        # columns, <= R+1 hops); `hops` is the unconditional backstop.
        def aug_cond(state):
            _j, _row4col, _col4row, done, hops = state
            return ~done & (hops <= R)

        def aug_body(state):
            j, row4col, col4row, _done, hops = state
            i = path[j]
            row4col = jnp.where(col_iota == j, i, row4col)
            prev_j = col4row[i]
            col4row = jnp.where(row_iota == i, j, col4row)
            return (prev_j, row4col, col4row, i == cur_row, hops + 1)

        # done starts True for gated-off lanes so the batched backtrack
        # also runs zero iterations for them (the select below discards
        # their branch result either way; iteration COUNT is what's shared).
        _, row4col, col4row, _, _ = jax.lax.while_loop(
            aug_cond, aug_body,
            (sink, row4col, col4row, ~do, jnp.int32(0)))
        return u2, v2, row4col, col4row

    # sink < 0 = no reachable free column (only possible when non-finite
    # costs slipped past the solve_lsa sanitizer): leave cur_row unassigned
    # (col4row stays -1) rather than corrupt duals with inf arithmetic.
    return jax.lax.cond(do & (sink >= 0), apply, lambda a: a,
                        (u, v, row4col, col4row))


@functools.partial(jax.jit, static_argnames=())
def solve_lsa(cost: jnp.ndarray, n_rows: jnp.ndarray) -> jnp.ndarray:
    """Solve min-cost assignment of rows to columns.

    Args:
      cost: [R, C] float32, R <= C (static shapes). Rows >= n_rows are padding.
      n_rows: scalar int, number of valid rows (may be traced).

    Returns:
      col4row: [R] int32 — for each row, its assigned column, or -1 for padded rows.

    Non-finite costs (NaN/inf — e.g. eval losses of a diverged or
    random-initialized model) are replaced by a finite sentinel larger than
    any all-finite assignment, so such entries are avoided whenever a finite
    assignment exists and the solve always terminates (scipy raises on
    infeasible matrices instead; raising is not expressible inside jit, and a
    hang — the pre-sanitizer behavior — took the whole eval loop with it).
    """
    R, C = cost.shape
    if R > C:
        raise ValueError(f"solve_lsa requires R <= C, got {cost.shape}")
    cost = cost.astype(jnp.float32)
    finite = jnp.isfinite(cost)
    big = (jnp.max(jnp.where(finite, jnp.abs(cost), 0.0)) + 1.0) * (R + 1)
    cost = jnp.where(finite, cost, big)

    row_iota = jnp.arange(R)
    col_iota = jnp.arange(C)
    valid_row = row_iota < n_rows

    # Row-reduction warm start (the rectangular-safe half of LAPJV's init,
    # Jonker & Volgenant 1987 §2): u = per-row min, v = 0, plus a greedy
    # TIGHT partial matching of each row to its argmin column (collisions:
    # lowest row index wins), all in parallel tensor ops. Each SAP phase
    # below then only augments the rows this init leaves unmatched — with
    # R << C column collisions are rare, so that's a handful instead of all
    # n_rows — and with row-reduced duals the Dijkstra paths it runs are
    # short. Exactness is unaffected: SAP requires feasible duals
    # (cost[i,j]-u[i]-v[j] >= 0 — holds, u is the row min and v=0), a
    # matching tight on assigned pairs (cost[i,argmin_i] - u[i] = 0), and —
    # the rectangular-LP subtlety — v == 0 on UNMATCHED columns
    # (complementary slackness with the <=1 column constraints; this is why
    # COLUMN reduction, which the square-only classic LAPJV also does, would
    # be WRONG here: it ends with nonzero v on never-used columns and the
    # greedy tight matching locks in a suboptimal assignment). The SAP phase
    # preserves the invariant: the only unmatched column whose v it touches
    # is the sink, which the augment immediately matches.
    best_col = jnp.argmin(cost, axis=1).astype(jnp.int32)     # [R]
    u0 = jnp.where(valid_row, jnp.min(cost, axis=1), 0.0).astype(jnp.float32)
    v0 = jnp.zeros((C,), jnp.float32)
    claims = (best_col[:, None] == col_iota[None, :]) & valid_row[:, None]
    winner = jnp.argmax(claims, axis=0).astype(jnp.int32)     # [C] lowest row
    row4col0 = jnp.where(jnp.any(claims, axis=0), winner, -1).astype(jnp.int32)
    col4row0 = jnp.where(
        valid_row & (row4col0[best_col] == row_iota), best_col, -1
    ).astype(jnp.int32)

    # Augment only the unmatched rows, compacted to the front so a batched
    # (vmapped) solve runs max-lanes(#unmatched) productive phases in
    # lockstep rather than R. Phases past a lane's count are gated off via
    # ``do`` (zero loop iterations — see _augment_one on why lax.cond can't
    # do this).
    unmatched = valid_row & (col4row0 < 0)
    order = jnp.argsort(~unmatched, stable=True)              # unmatched first
    n_unmatched = jnp.sum(unmatched)

    def body(p, state):
        return _augment_one(cost, *state, order[p], p < n_unmatched)

    _, _, _, col4row = jax.lax.fori_loop(
        0, R, body, (u0, v0, row4col0, col4row0))
    return col4row


def solve_lsa_batch(cost: jnp.ndarray, n_rows: jnp.ndarray) -> jnp.ndarray:
    """vmapped solve_lsa: cost [B, R, C], n_rows [B] -> [B, R] col assignment."""
    return jax.vmap(solve_lsa)(cost, n_rows)
