"""Pallas LSA kernel: equivalence with the XLA solver and scipy."""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

from toist_tpu.ops.lsa import solve_lsa_batch
from toist_tpu.ops.lsa_pallas import solve_lsa_batch_pallas


@pytest.mark.parametrize("shape,nvals", [
    ((3, 12, 50), (0, 3, 12)),
    ((4, 25, 100), (25, 1, 7, 25)),
])
def test_pallas_matches_scipy(shape, nvals):
    rng = np.random.default_rng(0)
    B, R, C = shape
    cost = rng.normal(size=shape).astype(np.float32)
    n = np.array([nvals[i % len(nvals)] for i in range(B)], np.int32)
    out = np.asarray(solve_lsa_batch_pallas(jnp.asarray(cost), jnp.asarray(n),
                                            interpret=True))
    for b in range(B):
        if n[b]:
            rows, cols = linear_sum_assignment(cost[b, :n[b]])
            np.testing.assert_allclose(
                cost[b, np.arange(n[b]), out[b, :n[b]]].sum(),
                cost[b, rows, cols].sum(), rtol=1e-5, atol=1e-5)
            assert len(set(out[b, :n[b]].tolist())) == n[b]
        assert (out[b, n[b]:] == -1).all()


def test_pallas_matches_xla_solver():
    rng = np.random.default_rng(1)
    cost = rng.uniform(size=(5, 20, 100)).astype(np.float32)
    n = np.array([20, 5, 0, 13, 20], np.int32)
    a = np.asarray(solve_lsa_batch(jnp.asarray(cost), jnp.asarray(n)))
    b = np.asarray(solve_lsa_batch_pallas(jnp.asarray(cost), jnp.asarray(n),
                                          interpret=True))
    # Continuous costs: unique optimum, assignments identical.
    np.testing.assert_array_equal(a, b)


def test_lsa_backend_policy():
    from toist_tpu.ops.matching import _lsa_backend_for

    # Forced xla wins regardless of context.
    assert _lsa_backend_for("softkd", "xla", "tpu", 1) == "xla"
    # "pallas" is the documented opt-in for the small Hungarian solve ONLY;
    # softkd stays on XLA (the 48-step A/B measured it a wash there).
    assert _lsa_backend_for("match", "pallas", "tpu", 1) == "pallas"
    assert _lsa_backend_for("softkd", "pallas", "tpu", 1) == "xla"
    # Per-site syntax reaches each solve independently.
    assert _lsa_backend_for("softkd", "softkd:pallas", "tpu", 1) == "pallas"
    assert _lsa_backend_for("match", "softkd:pallas", "tpu", 1) == "xla"
    assert _lsa_backend_for(
        "match", "match:pallas,softkd:pallas", "tpu", 1) == "pallas"
    # pallas is downgraded (with a warning) under multi-device meshes: a bare
    # pallas_call has no SPMD partitioning rule under pjit.
    with pytest.warns(UserWarning, match="SPMD"):
        assert _lsa_backend_for("match", "pallas", "tpu", 8) == "xla"
    # auto: XLA everywhere (48-step A/B was a wash; XLA is SPMD-safe and
    # pays no Mosaic lowering — see _lsa_backend_for docstring).
    assert _lsa_backend_for("softkd", "auto", "tpu", 1) == "xla"
    assert _lsa_backend_for("match", "auto", "tpu", 1) == "xla"
    assert _lsa_backend_for("softkd", "auto", "tpu", 8) == "xla"
    assert _lsa_backend_for("softkd", "auto", "cpu", 1) == "xla"


def test_solve_lsa_auto_cpu_matches_vmap():
    import jax

    from toist_tpu.ops.lsa import solve_lsa
    from toist_tpu.ops.matching import solve_lsa_auto

    rng = np.random.default_rng(3)
    cost = jnp.asarray(rng.normal(size=(4, 100, 100)).astype(np.float32))
    n = jnp.asarray(np.array([100, 70, 0, 99], np.int32))
    np.testing.assert_array_equal(
        np.asarray(solve_lsa_auto(cost, n)),
        np.asarray(jax.vmap(solve_lsa)(cost, n)))


def test_pallas_non_finite_costs_terminate():
    """Same regression as test_lsa.py::test_non_finite_costs_terminate...:
    the in-kernel SAP scan must exit (sink<0 via the _CUT reachability
    cutoff) instead of spinning when non-finite costs prevent relaxation;
    the wrapper's sanitizer keeps the result scipy-optimal on the
    sanitized matrix."""
    from scipy.optimize import linear_sum_assignment

    rng = np.random.default_rng(23)
    m = rng.normal(size=(2, 5, 9)).astype(np.float32)
    m[0][rng.random((5, 9)) < 0.3] = np.nan
    m[1][rng.random((5, 9)) < 0.3] = np.inf
    out = np.asarray(solve_lsa_batch_pallas(
        jnp.asarray(m), jnp.asarray([5, 5], np.int32), interpret=True))
    for b in range(2):
        finite = np.isfinite(m[b])
        san = np.where(finite, m[b], (np.abs(m[b][finite]).max() + 1) * 6)
        rows, cols = linear_sum_assignment(san)
        np.testing.assert_allclose(san[np.arange(5), out[b]].sum(),
                                   san[rows, cols].sum(), rtol=1e-5)
    # All-NaN batch element: still terminates with a permutation.
    allnan = np.full((1, 4, 6), np.nan, np.float32)
    out2 = np.asarray(solve_lsa_batch_pallas(
        jnp.asarray(allnan), jnp.asarray([4], np.int32), interpret=True))
    assert len(set(out2[0].tolist())) == 4 and (out2 >= 0).all()
