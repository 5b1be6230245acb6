"""toist_tpu — TPU-native task-oriented detection/segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of AIR-DISCOVER/TOIST
(see SURVEY.md at the repo root for the blueprint).
"""
import os

__version__ = "0.1.0"


def _enable_persistent_compile_cache() -> None:
    """Turn on JAX's persistent compilation cache unless the user opted out.

    The matcher/train-step compiles are expensive (minutes); caching them across
    processes makes every entry point after the first fast.
    """
    if os.environ.get("TOIST_NO_COMPILE_CACHE"):
        return
    import jax

    if jax.config.jax_compilation_cache_dir is None:
        cache_dir = os.environ.get(
            "TOIST_COMPILE_CACHE_DIR",
            os.path.expanduser("~/.cache/toist_tpu_xla"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


_enable_persistent_compile_cache()
