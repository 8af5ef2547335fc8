"""Structured training logs + throughput meter.

The reference logs via tqdm + scalar dumps (SURVEY.md section 5). Rebuild:
a JSONL step log (machine-readable) plus stdout lines, and a StepTimer that
reports images/sec/chip with compile time excluded — the BASELINE metric.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


def make_run_logger(train_cfg) -> "JsonlLogger":
    """The run-directory logging convention (out_dir/train_log.jsonl +
    optional TensorBoard), in ONE place — shared by the CLI entry points
    (which pass the logger to both the loop and the epoch-eval hook) and the
    loops' fallback, so step logs and eval logs can never split files.

    Under multihost (parallel/multihost.py) every process computes identical
    replicated metrics, so only process 0 writes the file/TB stream and
    echoes to stdout; the rest get a silent no-op logger."""
    from mcseg_tpu.parallel.multihost import is_primary

    if not is_primary():
        return JsonlLogger(path=None, echo=False)
    return JsonlLogger(
        path=os.path.join(train_cfg.out_dir, "train_log.jsonl"),
        tb_dir=train_cfg.tb_dir or None,
    )


class JsonlLogger:
    """JSONL + stdout, with an optional TensorBoard event stream.

    ``tb_dir`` writes every float in the record as a tf.summary scalar (the
    reference's TensorBoard-style logger surface); requires tensorflow, which
    is imported lazily only when the flag is set."""

    def __init__(self, path: Optional[str] = None, echo: bool = True,
                 tb_dir: Optional[str] = None):
        self.path = path
        self.echo = echo
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "a")
        else:
            self._f = None
        self._tb = None
        if tb_dir:
            try:
                import tensorflow as tf

                self._tb = tf.summary.create_file_writer(tb_dir)
            except ImportError:
                print(f"warning: --tb_dir {tb_dir!r} ignored (no tensorflow)")

    def log(self, record: Dict[str, Any]) -> None:
        record = {k: (float(v) if hasattr(v, "item") else v) for k, v in record.items()}
        if self._f:
            self._f.write(json.dumps(record) + "\n")
            self._f.flush()
        if self._tb is not None:
            import tensorflow as tf

            step = int(record.get("step", 0))
            with self._tb.as_default():
                for k, v in record.items():
                    if isinstance(v, float) and k != "step":
                        tf.summary.scalar(k, v, step=step)
            self._tb.flush()
        if self.echo:
            parts = [f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                     for k, v in record.items()]
            print("  ".join(parts), flush=True)

    def close(self):
        if self._f:
            self._f.close()


class StepTimer:
    """Throughput meter excluding warmup/compile steps."""

    def __init__(self, skip_first: int = 1):
        self.skip_first = skip_first
        self.n_steps = 0
        self.n_items = 0
        self._t0 = None

    def tick(self, items: int) -> None:
        self.n_steps += 1
        if self.n_steps == self.skip_first:
            self._t0 = time.perf_counter()
        elif self.n_steps > self.skip_first:
            self.n_items += items

    @property
    def items_per_sec(self) -> float:
        if self._t0 is None or self.n_items == 0:
            return 0.0
        return self.n_items / (time.perf_counter() - self._t0)
