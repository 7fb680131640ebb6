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
# 8 virtual devices time-share ONE core: a device thread can take minutes
# of wall-clock to reach a collective while the others run, so XLA:CPU's
# default 20 s warn / 40 s TERMINATE rendezvous timeouts CHECK-fail the
# whole process (SIGABRT mid-suite). Scale them to the emulation.
if "collective" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += (
        " --xla_cpu_collective_timeout_seconds=3600"
        " --xla_cpu_collective_call_terminate_timeout_seconds=3600")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the CI box is 1 CPU core and the suite is
# compile-bound (~40 min cold); warm reruns drop to minutes. The dir is
# host-fingerprinted (utils/jaxcache.py): XLA:CPU AOT entries bake in the
# compile machine's CPU features and the cache key doesn't — loading a
# foreign machine's entries SIGILLs/aborts mid-suite.
import sys  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from roboticsplayroompybullet_tpu.utils import jaxcache  # noqa: E402

jaxcache.setup(jax)
