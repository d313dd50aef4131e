"""Persistent XLA compilation cache setup.

The model's jitted graphs (25-frame detect scan, training step) take tens
of seconds to compile; a persistent on-disk cache makes every entry point
after the first start in seconds instead. The reference has no analogue
(PyTorch eager); for a compiled framework this is basic production
hygiene — the serving path cold-start drops from minutes to seconds.

Call :func:`enable_persistent_cache` before the first jit compilation.
Harmless if the backend cannot serialize executables (JAX logs and skips).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get(
    "PHNET_JAX_CACHE", os.path.join("/tmp", "phnet_jax_cache"))


def enable_persistent_cache(cache_dir: str = _DEFAULT_DIR) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir``."""
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache even fast compiles; the scan graphs dominate regardless
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir
