"""Host-fingerprinted persistent XLA compile-cache directory.

XLA:CPU AOT executables bake in the compile machine's CPU features, and
the persistent-cache key does NOT include them — a cache written on one
host and read on another loads executables whose instructions the new
host may not support ("Machine type used for XLA:CPU compilation doesn't
match the machine type for execution... SIGILL"), which crashed the test
suite with SIGABRT when this repo's rounds moved between machines. The
fix: suffix the cache dir with a hash of the host's stable CPU identity
so each machine gets its own cache, AND pin the raw identity text inside
the dir (fingerprint.txt) — if a dir exists whose pinned identity
differs from the live host (hash collision, or an old dir written by a
laxer fingerprint), the dir is rejected and a fresh one derived from the
full identity is used instead. No jax import here — callers may need to
set env vars before importing jax.
"""
from __future__ import annotations

import hashlib
import os
import platform

_BASE = "/tmp/jax_cache_playroom"

# stable ISA-relevant cpuinfo keys; volatile per-boot fields (cpu MHz,
# bogomips, apicid, core id, ...) are excluded so reboots keep the cache.
# `microcode` is included: updates can change effective feature sets.
_KEYS = ("vendor_id", "cpu family", "model name", "model\t", "model:",
         "stepping", "microcode", "flags", "address sizes",
         "cache_alignment")


def _host_identity() -> str:
    """Stable CPU identity text for this host (first processor block)."""
    lines = []
    try:
        with open("/proc/cpuinfo") as f:
            for ln in f:
                if not ln.strip():
                    break               # first processor block only
                if any(ln.startswith(k) for k in _KEYS):
                    lines.append(ln.strip())
    except OSError:
        pass
    if not lines:
        lines = [platform.machine(), platform.processor()]
    return "\n".join(lines) + "\n"


def cache_dir() -> str:
    """Per-host cache path; JAX_COMPILATION_CACHE_DIR overrides.

    The chosen dir carries fingerprint.txt = the full identity text. A
    pre-existing dir with a DIFFERENT pinned identity is never reused:
    its AOT entries were compiled for another machine and can SIGILL
    (the MULTICHIP_r03 cpu_aot_loader warnings) — the path is re-salted
    with the full-identity hash until an empty/matching dir is found.
    """
    override = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if override:
        return override
    ident = _host_identity()
    h = hashlib.sha1(ident.encode()).hexdigest()
    d = f"{_BASE}_{h[:10]}"
    for salt in range(4):
        fp_path = os.path.join(d, "fingerprint.txt")
        try:
            with open(fp_path) as f:
                pinned = f.read()
            if pinned == ident:
                return d
            # foreign dir: re-salt rather than poison this process
            d = f"{_BASE}_{h[:10]}_{salt}"
            continue
        except OSError:
            pass
        try:
            os.makedirs(d, exist_ok=True)
            with open(fp_path, "w") as f:
                f.write(ident)
        except OSError:
            pass                         # unwritable /tmp: still usable
        return d
    return d


def setup(jax_module) -> str:
    """Point jax's persistent compilation cache at the per-host dir."""
    d = cache_dir()
    jax_module.config.update("jax_compilation_cache_dir", d)
    jax_module.config.update("jax_persistent_cache_min_compile_time_secs",
                             0.2)
    jax_module.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return d
