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
