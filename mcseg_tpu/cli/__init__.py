"""CLI entry points (the reference's runnable scripts, SURVEY.md L5).

Each ``main()`` enables JAX's persistent compilation cache on entry
(utils/compile_cache.py: machine- and uid-keyed dir under /tmp; an explicit
JAX_COMPILATION_CACHE_DIR or prior jax.config setting always wins). Importing
this package has no side effects, so library consumers who only want
``argparse_compat`` keep full control of their own jax.config.
"""
