"""Test harness config: force an 8-virtual-device CPU mesh.

Tests never touch the (single, tunneled) TPU chip — sharding tests run on
`--xla_force_host_platform_device_count=8` CPU devices per the multi-host
test strategy (SURVEY.md §4). Must run before any jax computation.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the CI box is 1 CPU core and the suite is
# compile-bound (~40 min cold); warm reruns drop to minutes.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/jax_cache_playroom"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
