"""utils/xprof: XSpace trace parsing (profile-derived op breakdown)."""
import jax
import jax.numpy as jnp
import numpy as np

from toist_tpu.utils import xprof


def test_summarize_trace_cpu(tmp_path):
    @jax.jit
    def f(x):
        return jnp.tanh(x @ x.T).sum()

    x = jnp.ones((256, 256))
    float(f(x))
    with jax.profiler.trace(str(tmp_path)):
        for _ in range(2):
            y = f(x)
        float(y)
    s = xprof.summarize_trace(str(tmp_path), iters=2, device_substr="CPU")
    assert s["device_ms_per_iter"] > 0
    assert s["categories"] and s["top_ops"]
    names = [n for n, _ms, _p in s["categories"]]
    assert all(isinstance(n, str) for n in names)


def test_profile_fn(tmp_path):
    x = jnp.ones((128, 128))

    @jax.jit
    def g(x):
        return jnp.dot(x, x)

    # profile_fn takes a thunk; close over a real device input so the work
    # isn't constant-folded out of the trace.
    s = xprof.profile_fn(lambda: g(x), str(tmp_path / "t"), iters=2)
    assert s["device_ms_per_iter"] >= 0
