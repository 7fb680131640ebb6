"""Host-fingerprinted persistent XLA compile-cache directory.

XLA:CPU AOT executables bake in the compile machine's CPU features, and
the persistent-cache key does NOT include them — a cache written on one
host and read on another loads executables whose instructions the new
host may not support ("Machine type used for XLA:CPU compilation doesn't
match the machine type for execution... SIGILL"), which crashed the test
suite with SIGABRT when this repo's rounds moved between machines. The
fix: suffix the cache dir with a hash of the host's CPU flags so each
machine gets its own cache. No jax import here — callers may need to set
env vars before importing jax.
"""
from __future__ import annotations

import hashlib
import os
import platform

_BASE = "/tmp/jax_cache_playroom"


def cache_dir() -> str:
    """Per-host cache path; JAX_COMPILATION_CACHE_DIR overrides."""
    override = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if override:
        return override
    # Hash model identity (family/model/stepping/model name) AND flags:
    # LLVM derives tuning features (e.g. prefer-no-scatter) from the CPUID
    # model, so two hosts with identical flag lists but different models
    # still produce incompatible AOT executables (observed: a VM
    # rescheduled onto different physical hardware between rounds kept
    # the same flags hash but tripped cpu_aot_loader feature mismatches).
    keys = ("flags", "model name", "cpu family", "model\t",
            "model:", "stepping", "vendor_id")
    try:
        with open("/proc/cpuinfo") as f:
            lines = []
            for ln in f:
                if not ln.strip():
                    break               # first processor block only
                if any(ln.startswith(k) for k in keys):
                    lines.append(ln)
        fp = "".join(lines)
    except OSError:
        fp = ""
    fp = fp or platform.machine() + platform.processor()
    h = hashlib.sha1(fp.encode()).hexdigest()[:10]
    return f"{_BASE}_{h}"


def setup(jax_module) -> str:
    """Point jax's persistent compilation cache at the per-host dir."""
    d = cache_dir()
    jax_module.config.update("jax_compilation_cache_dir", d)
    jax_module.config.update("jax_persistent_cache_min_compile_time_secs",
                             0.2)
    jax_module.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return d
