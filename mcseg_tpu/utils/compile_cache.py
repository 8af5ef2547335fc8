"""Persistent XLA compilation cache setup, shared by every entry point.

Cold compiles of the fused MCD step take minutes; cached reruns are seconds.
One helper so the CLI, bench, profiler, and test conftest agree on the same
directory convention:

  * keyed on the host CPU's feature flags — AOT entries from a different
    machine load with "machine feature mismatch" warnings and subtly
    different codegen, so they must never be shared;
  * keyed on the uid — /tmp is world-shared and a cache dir owned by another
    user is both unwritable and untrustworthy.

``enable_persistent_cache`` is a no-op when the user already configured a
cache (JAX_COMPILATION_CACHE_DIR env var or jax.config), so explicit
settings always win.
"""

from __future__ import annotations

import hashlib
import os


def default_cache_dir(prefix: str = "mcseg_jax_cache") -> str:
    try:
        with open("/proc/cpuinfo") as f:
            cpu = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        cpu = ""
    key = hashlib.sha1(cpu.encode()).hexdigest()[:10]
    uid = os.getuid() if hasattr(os, "getuid") else 0
    return f"/tmp/{prefix}_u{uid}_{key}"


def enable_persistent_cache() -> None:
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    import jax

    if jax.config.jax_compilation_cache_dir:
        return  # already configured programmatically
    jax.config.update("jax_compilation_cache_dir", default_cache_dir())
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
