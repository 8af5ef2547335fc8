"""CLI entry points (the reference's runnable scripts, SURVEY.md L5).

Importing this package enables JAX's persistent compilation cache by default
(cold compiles of the fused MCD step take minutes; cached reruns are
seconds). The dir is keyed on the host CPU's feature flags so AOT entries
from a different machine are never reused (they load with "machine feature
mismatch" warnings and subtly different codegen — see tests/conftest.py).
An explicit JAX_COMPILATION_CACHE_DIR always wins.
"""

import hashlib
import os


def _default_cache_dir() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            cpu = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        cpu = ""
    key = hashlib.sha1(cpu.encode()).hexdigest()[:10]
    return f"/tmp/mcseg_jax_cache_{key}"


if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
    import jax

    jax.config.update("jax_compilation_cache_dir", _default_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
