"""Parity tests of the on-device LSA solver against scipy.optimize.linear_sum_assignment."""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

from toist_tpu.ops.lsa import solve_lsa, solve_lsa_batch


def _check(cost, n_rows=None):
    R, C = cost.shape
    n = R if n_rows is None else n_rows
    ours = np.asarray(solve_lsa(jnp.asarray(cost), jnp.int32(n)))
    rows, cols = linear_sum_assignment(cost[:n])
    ref_cost = cost[rows, cols].sum()
    # Valid rows assigned to distinct columns.
    assert (ours[:n] >= 0).all()
    assert len(set(ours[:n].tolist())) == n
    assert (ours[n:] == -1).all()
    our_cost = cost[np.arange(n), ours[:n]].sum()
    np.testing.assert_allclose(our_cost, ref_cost, rtol=1e-5, atol=1e-5)
    return ours


@pytest.mark.parametrize("shape", [(1, 1), (1, 5), (5, 5), (20, 100), (25, 100), (100, 100)])
def test_random_matrices(shape):
    rng = np.random.default_rng(42)
    for _ in range(8):
        cost = rng.normal(size=shape).astype(np.float32)
        _check(cost)


def test_exact_assignment_matches_scipy_on_continuous():
    # With continuous random costs ties are measure-zero: assignments should be identical.
    rng = np.random.default_rng(7)
    for _ in range(20):
        cost = rng.uniform(size=(15, 60)).astype(np.float32)
        ours = _check(cost)
        _, cols = linear_sum_assignment(cost)
        np.testing.assert_array_equal(ours, cols)


def test_tied_costs_optimal():
    # All-equal costs: any permutation is optimal; check optimality not identity.
    cost = np.ones((8, 12), np.float32)
    _check(cost)
    # Block ties.
    cost = np.repeat(np.arange(4, dtype=np.float32), 3)[None, :] * np.ones((6, 1), np.float32)
    _check(cost)


def test_adversarial_values():
    rng = np.random.default_rng(3)
    big = rng.choice([0.0, 1e6, -1e6, 1.0], size=(10, 40)).astype(np.float32)
    _check(big)


def test_padded_rows():
    rng = np.random.default_rng(5)
    cost = rng.normal(size=(25, 100)).astype(np.float32)
    for n in [0, 1, 7, 25]:
        ours = np.asarray(solve_lsa(jnp.asarray(cost), jnp.int32(n)))
        if n:
            rows, cols = linear_sum_assignment(cost[:n])
            np.testing.assert_allclose(
                cost[np.arange(n), ours[:n]].sum(), cost[rows, cols].sum(), rtol=1e-5)
        assert (ours[n:] == -1).all()


def test_batch():
    rng = np.random.default_rng(11)
    cost = rng.normal(size=(4, 12, 50)).astype(np.float32)
    n = np.asarray([0, 3, 12, 7], np.int32)
    out = np.asarray(solve_lsa_batch(jnp.asarray(cost), jnp.asarray(n)))
    for b in range(4):
        if n[b]:
            rows, cols = linear_sum_assignment(cost[b, :n[b]])
            np.testing.assert_allclose(
                cost[b, np.arange(n[b]), out[b, :n[b]]].sum(),
                cost[b, rows, cols].sum(), rtol=1e-5, atol=1e-5)
        assert (out[b, n[b]:] == -1).all()


def test_non_finite_costs_terminate_and_stay_optimal():
    """NaN/inf cost entries must not hang the SAP while_loop.

    Regression: with non-finite entries nothing relaxes `shortest`, the
    masked argmin re-picks an already-scanned column, and the pre-sanitizer
    solver spun forever (seen live: a random-weight checkpoint's eval losses
    produced NaN cost rows and hung the whole eval loop). The sanitizer maps
    non-finite entries to a finite sentinel larger than any all-finite
    assignment, so the solve terminates AND matches scipy on the sanitized
    matrix (optimal among finite entries whenever feasible)."""
    # Degenerate: every entry non-finite — must terminate with a permutation.
    all_nan = jnp.full((4, 6), np.nan, jnp.float32)
    out = np.asarray(solve_lsa(all_nan, jnp.int32(4)))
    assert len(set(out.tolist())) == 4 and (out >= 0).all()

    rng = np.random.default_rng(17)
    for trial, bad in enumerate([np.nan, np.inf, -np.inf] * 8):
        m = rng.normal(size=(5, 9)).astype(np.float32)
        m[rng.random((5, 9)) < 0.3] = bad
        ours = np.asarray(solve_lsa(jnp.asarray(m), jnp.int32(5)))
        finite = np.isfinite(m)
        sent = (np.abs(m[finite]).max() + 1.0) * 6
        san = np.where(finite, m, sent)
        rows, cols = linear_sum_assignment(san)
        np.testing.assert_allclose(san[np.arange(5), ours].sum(),
                                   san[rows, cols].sum(), rtol=1e-5,
                                   err_msg=f"trial {trial}")
