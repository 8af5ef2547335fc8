"""Checkpoint save/load with config round-trip.

The reference saves a plain torch dict per epoch —
``{epoch, args, g_state_dict, f1_state_dict, f2_state_dict, optimizer_g,
optimizer_f}`` — and its testers rebuild the model FROM THE ARGS STORED IN THE
CHECKPOINT (SURVEY.md section 5, a public surface). We preserve that logical
layout with a msgpack payload + JSON config sidecar:

    <prefix>.msgpack       {step, params{G,F1,F2}, batch_stats, opt_g, opt_f, rng}
    <prefix>.config.json   ExperimentConfig dict (the 'args')

``load_checkpoint(prefix)`` reads the config, rebuilds the exact model/opt
state skeleton via ``create_train_state``, and restores into it — the same
args->model round-trip. Deterministic resume restores params, BOTH optimizer
states, step and RNG key (SURVEY.md section 5 failure-recovery contract).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from mcseg_tpu.core.config import ExperimentConfig
from mcseg_tpu.train.state import MCDTrainState, create_train_state
from mcseg_tpu.utils.util import load_json, mkdir_if_not_exist, save_dic_to_json


def _state_to_dict(state: MCDTrainState) -> dict:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_g": state.opt_g,
        "opt_f": state.opt_f,
        "rng": jax.random.key_data(state.rng),
    }


def _write_host_state(prefix: str, host_state: dict, cfg_dict: dict) -> str:
    """Serialize + atomically publish an already-host-resident snapshot.
    Runs on the caller thread (sync save) or the writer thread (async)."""
    mkdir_if_not_exist(os.path.dirname(prefix) or ".")
    blob = serialization.to_bytes(host_state)
    path = prefix + ".msgpack"
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    cfg_path = prefix + ".config.json"
    save_dic_to_json(cfg_dict, cfg_path + ".tmp")
    os.replace(cfg_path + ".tmp", cfg_path)
    return path


def save_checkpoint(prefix: str, state: MCDTrainState, config: ExperimentConfig) -> str:
    """Write <prefix>.msgpack + <prefix>.config.json; returns the msgpack path.

    Writes are ATOMIC (tmp file + os.replace): a crash or preemption
    mid-write can never leave a truncated checkpoint at the published path —
    the failure-recovery contract is "rerun with --resume <prefix>"
    (SURVEY.md section 5), which only holds if <prefix> is always either the
    old complete checkpoint or the new complete one."""
    host_state = jax.device_get(_state_to_dict(state))
    return _write_host_state(prefix, host_state, config.to_dict())


class AsyncCheckpointer:
    """Overlap checkpoint serialization + disk writes with training.

    ``save()`` snapshots the device state to host memory on the caller
    thread (the only device-synchronizing part, ~the cost of one
    device_get), then hands serialization and the atomic file writes to ONE
    background writer thread — the train loop resumes stepping while the
    msgpack blob is still being encoded and written. The reference's torch
    trainers block each epoch on ``torch.save`` (SURVEY.md section 5); on a
    TPU host the step cadence is fast enough that a multi-hundred-MB
    synchronous write is a measurable stall, and the write is pure host work
    the device never needs to wait for.

    Guarantees kept from the sync path:
      * writes are atomic (same tmp + os.replace) and land in submission
        order (single worker, FIFO queue);
      * at most one snapshot is queued (maxsize=1) and one in flight, so
        peak extra host memory is bounded at ~2x one state snapshot, with
        back-pressure instead of unbounded growth when the disk can't keep
        up;
      * a writer-thread failure is never silent — it re-raises on the next
        ``save()`` or on ``join()``;
      * ``join()`` blocks until every accepted write is published — loops
        call it before the final sync 'last' save, so on return from a
        training loop the directory is complete (resume/preemption
        contracts unchanged).

    ``after`` callbacks (e.g. epoch pruning) run on the writer thread AFTER
    the write publishes — pruning keyed off the filesystem therefore always
    sees the checkpoint it just wrote.
    """

    def __init__(self):
        import queue
        import threading

        self._q = queue.Queue(maxsize=1)
        self._err = None
        self._lock = threading.Lock()
        self._thread = threading.Thread(
            target=self._run, name="mcseg-ckpt-writer", daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            job = self._q.get()
            try:
                if job is None:
                    return
                prefix, host_state, cfg_dict, after = job
                _write_host_state(prefix, host_state, cfg_dict)
                if after is not None:
                    after()
            except BaseException as e:  # surfaced on next save()/join()
                with self._lock:
                    self._err = e
            finally:
                self._q.task_done()

    def _raise_pending(self):
        with self._lock:
            err, self._err = self._err, None
        if err is not None:
            raise RuntimeError("async checkpoint write failed") from err

    def save(self, prefix: str, state: MCDTrainState,
             config: ExperimentConfig, after=None) -> None:
        """Snapshot now (device_get), write in the background."""
        self._raise_pending()
        host_state = jax.device_get(_state_to_dict(state))
        self._q.put((prefix, host_state, config.to_dict(), after))

    def join(self) -> None:
        """Block until every accepted write has published; re-raise any
        writer failure."""
        self._q.join()
        self._raise_pending()

    def close(self) -> None:
        self.join()
        self._q.put(None)
        self._thread.join()


def prune_epoch_checkpoints(out_dir: str, keep: int) -> list:
    """Delete all but the newest ``keep`` epoch checkpoints (``epN.msgpack``
    + config sidecars) in ``out_dir``. ``last`` is never touched; ``keep <=
    0`` is a no-op (reference behavior: every epoch kept). Returns the
    pruned prefixes. Called by the training loops after each epoch save when
    TrainConfig.keep_checkpoints is set — a 100-epoch DRN-D-38 run otherwise
    accumulates ~20 GB of epoch checkpoints."""
    if keep <= 0:
        return []
    import glob
    import re

    eps = []
    for p in glob.glob(os.path.join(out_dir, "ep*.msgpack")):
        m = re.fullmatch(r"ep(\d+)\.msgpack", os.path.basename(p))
        if m:
            eps.append((int(m.group(1)), p[: -len(".msgpack")]))
    eps.sort()
    pruned = []
    for _, prefix in eps[:-keep]:
        for suffix in (".msgpack", ".config.json"):
            try:
                os.remove(prefix + suffix)
            except FileNotFoundError:
                pass
        pruned.append(prefix)
    return pruned


def load_checkpoint(
    prefix: str, config: Optional[ExperimentConfig] = None
) -> Tuple[MCDTrainState, ExperimentConfig]:
    """Rebuild (state, config) from a checkpoint prefix. The model/optimizer
    skeleton comes from the EMBEDDED config unless an override is given.

    Multitask checkpoints are detected from the payload itself (a 'D'
    depth-head subtree under params) and restored into a multitask skeleton —
    the same args->model round-trip, one format for all trainers."""
    if config is None:
        config = ExperimentConfig.from_dict(load_json(prefix + ".config.json"))
    with open(prefix + ".msgpack", "rb") as f:
        blob = f.read()
    raw = serialization.msgpack_restore(blob)
    if "D" in raw.get("params", {}):
        from mcseg_tpu.train.multitask import init_multitask_state

        skeleton, _, _, _ = init_multitask_state(
            config.model, config.train, jax.random.key(0), img_shape=(16, 16),
            with_boundary="B" in raw["params"],
        )
    else:
        skeleton, _, _ = create_train_state(
            config.model, config.train, jax.random.key(0), img_shape=(16, 16)
        )
    target = _state_to_dict(skeleton)
    # raw was already msgpack-restored for the multitask probe above;
    # from_state_dict avoids deserializing the whole blob a second time.
    restored = serialization.from_state_dict(target, raw)
    state = MCDTrainState(
        step=jnp.asarray(restored["step"]),
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_g=restored["opt_g"],
        opt_f=restored["opt_f"],
        rng=jax.random.wrap_key_data(jnp.asarray(restored["rng"])),
    )
    return state, config


def checkpoint_exists(prefix: str) -> bool:
    return os.path.exists(prefix + ".msgpack") and os.path.exists(
        prefix + ".config.json"
    )
