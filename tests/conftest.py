"""Test harness: run everything on a virtual 8-device CPU mesh.

Must configure the platform before jax initializes a backend, hence the
environment mutation at import time (conftest is imported before any test
module).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

# persistent compile cache: model-compile-heavy tests go from minutes to
# seconds on re-runs
jax.config.update("jax_compilation_cache_dir", "/tmp/phnet_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
