"""Test configuration: run on CPU with 8 virtual devices and float64 enabled.

The container pins ``JAX_PLATFORMS=axon`` (a tunneled real TPU) via
sitecustomize; tests must run on the local CPU backend with a virtual
8-device mesh instead (SURVEY.md section 4: distributed tests use
``--xla_force_host_platform_device_count``), so we override the platform via
jax.config before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: many tests lower IDENTICAL HLO (same step
# function shapes across parametrizations and engines); the disk cache
# turns every repeat into a cheap deserialize — both across runs and
# within one run (suite wall-time directive, VERDICT r2 task 8).
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
