"""CLI entry points (the reference's runnable scripts, SURVEY.md L5).

Importing this package enables JAX's persistent compilation cache by default
(utils/compile_cache.py: machine- and uid-keyed dir under /tmp; an explicit
JAX_COMPILATION_CACHE_DIR or prior jax.config setting always wins).
"""

from mcseg_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()
