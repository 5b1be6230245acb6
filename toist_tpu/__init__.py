"""toist_tpu — TPU-native task-oriented detection/segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of AIR-DISCOVER/TOIST
(see SURVEY.md at the repo root for the blueprint).
"""
import os

__version__ = "0.1.0"


def _enable_persistent_compile_cache() -> None:
    """Opt-in persistent compilation cache (TOIST_COMPILE_CACHE_DIR=<dir>).

    Off by default: on this platform the cache key/lookup path itself costs
    minutes per process (measured: the same train-step script runs 60s without
    a cache dir configured and >300s with one), defeating the purpose.
    """
    cache_dir = os.environ.get("TOIST_COMPILE_CACHE_DIR")
    if not cache_dir:
        return
    import jax

    if jax.config.jax_compilation_cache_dir is None:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 60.0)


_enable_persistent_compile_cache()
