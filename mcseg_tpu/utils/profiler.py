"""Profiling hooks (SURVEY.md section 5 rebuild item).

The reference has nothing beyond tqdm rates; here: a context manager around
``jax.profiler`` trace collection plus a convenience that times a jitted step
with compile excluded and returns images/sec — the BASELINE metric.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str] = "/tmp/mcseg_trace"):
    """Capture an XLA/TPU profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def time_step(step_fn: Callable, *args, iters: int = 10, items_per_call: int = 1,
              **kwargs) -> dict:
    """Time a jitted step: one warmup call (compile), then `iters` timed calls.

    The step is assumed state-threading (first arg/first result = state) when
    the result is a tuple; otherwise outputs are simply blocked on.
    """
    out = step_fn(*args, **kwargs)
    state_threading = isinstance(out, tuple) and len(args) >= 1
    jax.block_until_ready(out)
    if state_threading:
        args = (out[0],) + args[1:]

    t0 = time.perf_counter()
    for _ in range(iters):
        out = step_fn(*args, **kwargs)
        if state_threading:
            args = (out[0],) + args[1:]
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return {
        "sec_per_iter": dt / iters,
        "items_per_sec": items_per_call * iters / dt,
    }
