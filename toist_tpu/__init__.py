"""toist_tpu — TPU-native task-oriented detection/segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of AIR-DISCOVER/TOIST
(see SURVEY.md at the repo root for the blueprint).
"""
__version__ = "0.1.0"

# Persistent XLA compile-cache wiring lives in utils/compile_cache.py
# (enable_persistent_cache; TOIST_COMPILE_CACHE env var, default-on from
# main.py / bench.py). The package import itself configures nothing.
