"""Test configuration: force a virtual 8-device CPU backend before JAX initializes.

Mirrors SURVEY.md §4's plan: multi-device behavior (mesh, psum, eval gather, cluster-bank
all_gather) is exercised deterministically on fake devices, no TPU needed
(XLA_FLAGS=--xla_force_host_platform_device_count=8).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/TPU default for tests
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon sitecustomize (PYTHONPATH=/root/.axon_site) registers the remote-TPU
# backend at interpreter start and sets jax.config jax_platforms="axon,cpu"
# PROGRAMMATICALLY, which overrides the env var above — silently routing "CPU"
# tests through the TPU tunnel. Force the config back to cpu.
import jax  # noqa: E402

if jax.config.jax_platforms != "cpu":
    jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

# Persistent compilation cache: safe and fast on the true-CPU backend (the
# earlier slowness was the remote-TPU tunnel, not the cache itself). Saves
# the tiny-model train-step compiles across test runs.
if jax.config.jax_compilation_cache_dir is None:
    _cache = os.path.expanduser("~/.cache/toist_tpu_test_xla")
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
