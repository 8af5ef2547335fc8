"""Test harness: run everything on CPU with 8 virtual XLA devices so the
data-parallel mesh path is exercised without TPU hardware (SURVEY.md section 4,
'distributed-without-a-cluster')."""

import os

# Must happen before jax initializes its backends.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The sandbox's sitecustomize forces jax_platforms to "axon,cpu" regardless of
# the env var; override through the config API so tests really run on the
# 8-virtual-device CPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: recompiling the DRN autodiff graphs dominates
# test wall-clock otherwise. Machine- and uid-keyed dir (one convention for
# CLI/bench/profiler/tests — see utils/compile_cache.py). Tests force it even
# over a user-set JAX_COMPILATION_CACHE_DIR for reproducible timings.
from mcseg_tpu.utils.compile_cache import default_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", default_cache_dir())
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
