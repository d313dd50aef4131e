"""Test harness: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize imports jax at interpreter startup with
``JAX_PLATFORMS=axon`` (the remote TPU tunnel), so mutating ``os.environ``
here is too late for the import-time config snapshot. Backends initialize
lazily though, so ``jax.config.update`` still wins as long as no
computation ran yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (already imported by sitecustomize; config still open)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# persistent compile cache: model-compile-heavy tests go from minutes to
# seconds on re-runs
jax.config.update("jax_compilation_cache_dir", "/tmp/phnet_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()
