"""High-level training loops — the L5 trainer/driver layer.

Counterparts of the reference's ``source_trainer.py`` / ``adapt_trainer.py``
__main__ bodies (SURVEY.md sections 3.1-3.2), as importable functions. Each
iteration is ONE dispatch of a single jit-compiled program that fuses the
on-device preprocessing (ops/preprocess.py) with the train step (train/
source.py | mcd.py); host threads keep the next raw uint8 batch prefetched on
the mesh (data/pipeline.py). Parameters/optimizer state are replicated,
batches are sharded on the 'data' axis, and XLA inserts the ICI psum for
gradients automatically.
"""

from __future__ import annotations

import functools

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mcseg_tpu.core.config import ExperimentConfig
from mcseg_tpu.data.datasets import ZipDataset, get_dataset
from mcseg_tpu.data.labels import get_label_spec
from mcseg_tpu.data.pipeline import batch_iterator, device_prefetch
from mcseg_tpu.models.factory import _dtype_of, get_models
from mcseg_tpu.ops.preprocess import host_table, make_train_preprocess
from mcseg_tpu.parallel.mesh import constrain_spatial, make_mesh, replicate
from mcseg_tpu.train.mcd import make_mcd_step
from mcseg_tpu.train.source import make_source_step
from mcseg_tpu.train.state import create_train_state
from mcseg_tpu.utils.checkpoint import (
    AsyncCheckpointer,
    load_checkpoint,
    prune_epoch_checkpoints,
    save_checkpoint,
)
from mcseg_tpu.utils.logging import JsonlLogger, StepTimer, make_run_logger
from mcseg_tpu.utils.util import mkdir_if_not_exist


def _spatial(mesh, *arrays):
    """Apply the 'space'-axis height-sharding hint to every preprocessed
    input of a train step (no-op on 1-D data-parallel meshes). Placed AFTER
    preprocessing: the host pipeline and device corpus stay batch-sharded,
    and GSPMD reshards once here, then propagates H-sharding through the
    whole network (conv halos, BN/loss cross-shard reductions inserted by
    the compiler)."""
    out = tuple(constrain_spatial(mesh, x) for x in arrays)
    return out if len(out) > 1 else out[0]


class _EpochSaver:
    """Epoch-checkpoint policy shared by the three train loops: async by
    default (AsyncCheckpointer — the loop keeps stepping while the msgpack
    blob encodes and writes on the background thread), sync under
    --sync_checkpoint. Retention pruning runs AFTER the write publishes in
    either mode, so it always sees the checkpoint it accompanies.
    ``finish`` flushes pending writes, then performs the final ``last`` save
    synchronously — on return from a loop the run directory is complete and
    the resume/preemption contracts are unchanged."""

    def __init__(self, cfg: ExperimentConfig, out_dir: str):
        from mcseg_tpu.parallel.multihost import is_primary

        self._cfg, self._out_dir = cfg, out_dir
        # multihost: params are replicated + deterministic across processes,
        # so exactly one process (0) writes; the others no-op here and meet
        # process 0 at the finish() barrier below
        self._primary = is_primary()
        self._async = (AsyncCheckpointer()
                       if cfg.train.async_checkpoint and self._primary
                       else None)

    def save_epoch(self, epoch: int, state) -> None:
        if not self._primary:
            return
        prefix = os.path.join(self._out_dir, f"ep{epoch}")
        prune = functools.partial(prune_epoch_checkpoints, self._out_dir,
                                  self._cfg.train.keep_checkpoints)
        if self._async is not None:
            self._async.save(prefix, state, self._cfg, after=prune)
        else:
            save_checkpoint(prefix, state, self._cfg)
            prune()

    def finish(self, state) -> str:
        from mcseg_tpu.parallel.multihost import sync

        path = os.path.join(self._out_dir, "last")
        if self._primary:
            if self._async is not None:
                self._async.close()
            path = save_checkpoint(path, state, self._cfg)
        # no process exits (possibly tearing down a preempted pod VM) while
        # process 0 is still flushing the final checkpoint
        sync("final-checkpoint")
        return path


def _check_finite(metrics, step) -> None:
    """NaN guard (SURVEY.md section 5): fail fast with context instead of
    silently training on garbage. Checked at log points only (free)."""
    import numpy as np

    for k, v in metrics.items():
        if not np.all(np.isfinite(v)):
            raise FloatingPointError(
                f"non-finite metric {k}={v} at step {step}; "
                "lower --lr or inspect the input pipeline"
            )


class _GracefulStop:
    """SIGTERM/SIGINT-aware stop flag — the preemption contract for managed
    TPU fleets (maintenance events deliver SIGTERM): the first signal lets
    the in-flight iteration finish, after which the loop breaks and the
    normal end-of-training path writes the final `last` checkpoint, so
    `--resume <out_dir>/last` continues the run (the interrupted epoch's
    data stream replays from its boundary — see _start_epoch). A second
    signal raises KeyboardInterrupt (hard stop). The reference has no
    counterpart (SURVEY.md section 5: crash = rerun); this narrows the
    window where "rerun" loses work from an epoch to an iteration."""

    def install(self, max_hours: float = 0.0):
        import signal
        import time

        self._deadline = time.time() + max_hours * 3600 if max_hours else None
        self.stop = False
        self._prev = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                self._prev[sig] = signal.signal(sig, self._handle)
            except ValueError:  # not the main thread (embedded/test use)
                pass
        return self

    def _handle(self, signum, frame):
        if self.stop:
            raise KeyboardInterrupt(f"second signal {signum}: hard stop")
        self.stop = True
        print(f"signal {signum}: finishing the current iteration, then "
              "writing the final checkpoint and exiting", flush=True)

    def expired(self) -> bool:
        """True once the --max_hours wall-clock budget is exhausted; exits
        through the same graceful final-checkpoint path as a signal."""
        import time

        if self._deadline is not None and time.time() > self._deadline:
            if not self.stop:
                print("max_hours budget exhausted: writing the final "
                      "checkpoint and exiting", flush=True)
                self.stop = True
            return True
        return False

    def restore(self):
        import signal

        for sig, h in self._prev.items():
            signal.signal(sig, h)


def _input_stream(dataset, mesh, cfg: ExperimentConfig, start_epoch: int):
    """Pick the training input path: HBM-resident corpus (device_corpus.py —
    decode once, feed steps by index, zero steady-state H2D traffic) when
    enabled/fitting, else host decode threads + double-buffered prefetch.
    Both produce the identical sharded batch stream for a given seed."""
    from mcseg_tpu.data.device_corpus import corpus_stream, resolve_device_corpus
    from mcseg_tpu.parallel.mesh import local_batch_rows

    if resolve_device_corpus(cfg.data, dataset):
        return corpus_stream(
            dataset, mesh, cfg.data.batch_size, seed=cfg.train.seed,
            epochs=cfg.train.epochs, start_epoch=start_epoch,
        )
    return device_prefetch(
        batch_iterator(dataset, cfg.data.batch_size, seed=cfg.train.seed,
                       epochs=cfg.train.epochs, start_epoch=start_epoch,
                       num_workers=cfg.data.num_workers,
                       # multihost: decode only this process's rows
                       local_rows=local_batch_rows(mesh, cfg.data.batch_size)),
        mesh,
    )


# Checkpoint fields that determine the parameter/optimizer tree: resuming
# with a different value would die later with a cryptic tree mismatch, so
# _init_or_resume checks them up front and raises a clear error instead.
_RESUME_STRUCTURAL_FIELDS = (
    ("model", "net"), ("model", "input_ch"), ("model", "n_class"),
    ("model", "method"), ("model", "fusion"), ("model", "upsample"),
    ("train", "opt"),
)


def _check_resume_config(cli_cfg: ExperimentConfig, ckpt_cfg: ExperimentConfig,
                         resume_path: str) -> None:
    drift = []
    for section, name in _RESUME_STRUCTURAL_FIELDS:
        cli_v = getattr(getattr(cli_cfg, section), name)
        ckpt_v = getattr(getattr(ckpt_cfg, section), name)
        if cli_v != ckpt_v:
            drift.append(f"--{name}: checkpoint has {ckpt_v!r}, CLI has {cli_v!r}")
    if drift:
        raise ValueError(
            f"--resume {resume_path!r} config mismatch — the checkpointed model "
            "cannot be restored into the requested architecture:\n  "
            + "\n  ".join(drift)
            + "\nDrop the conflicting flag(s) or resume a matching checkpoint."
        )


def _init_or_resume(cfg: ExperimentConfig):
    tw, th = cfg.data.train_img_shape
    if cfg.train.resume:
        state, ckpt_cfg = load_checkpoint(cfg.train.resume)
        _check_resume_config(cfg, ckpt_cfg, cfg.train.resume)
        _, tx_g, tx_f = create_train_state(
            cfg.model, cfg.train, jax.random.key(cfg.train.seed), img_shape=(16, 16)
        )
        return state, tx_g, tx_f
    return create_train_state(
        cfg.model, cfg.train, jax.random.key(cfg.train.seed), img_shape=(th, tw)
    )


def train_source(
    cfg: ExperimentConfig,
    mesh=None,
    logger: Optional[JsonlLogger] = None,
    max_iterations: Optional[int] = None,
    on_epoch_end: Optional[Callable] = None,
):
    """Supervised source-only training (reference source_trainer.py)."""
    mesh = mesh or make_mesh(spatial=cfg.train.spatial_devices)
    out_dir = mkdir_if_not_exist(cfg.train.out_dir)
    logger = logger or make_run_logger(cfg.train)

    dataset = get_dataset(cfg.data.src_dataset, cfg.data, cfg.data.split)
    state, tx_g, tx_f = _init_or_resume(cfg)
    state = replicate(mesh, state)
    g, f1, f2 = get_models(cfg.model)
    pp = make_train_preprocess(cfg.data, compute_dtype=_dtype_of(cfg.model))
    inner = make_source_step(g, f1, f2, tx_g, tx_f, cfg.train)
    data_key = jax.random.key(cfg.train.seed + 1)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def full_step(state, raw_batch):
        key = jax.random.fold_in(data_key, state.step)
        img, label = _spatial(mesh, *pp(raw_batch, key))
        return inner(state, img, label)

    timer = StepTimer()
    # resumed runs continue the global step in logs/NaN reports
    step0 = int(jax.device_get(state.step))
    steps_per_epoch = max(len(dataset) // cfg.data.batch_size, 1)
    start_epoch = _start_epoch(cfg, state, steps_per_epoch)
    it = _input_stream(dataset, mesh, cfg, start_epoch)
    stop = _GracefulStop().install(cfg.train.max_hours)
    saver = _EpochSaver(cfg, out_dir)
    try:
        for i, raw in enumerate(it):
            if stop.stop or (i > 0 and stop.expired()) or (max_iterations is not None and i >= max_iterations):
                break
            state, metrics = full_step(state, raw)
            timer.tick(cfg.data.batch_size)
            if i % cfg.train.log_every == 0:
                host_metrics = jax.device_get(metrics)
                _check_finite(host_metrics, step0 + i)
                logger.log({"step": step0 + i, **host_metrics,
                            "img_per_sec": timer.items_per_sec})
            if (i + 1) % steps_per_epoch == 0:
                epoch = start_epoch + (i + 1) // steps_per_epoch
                if (cfg.train.checkpoint_every_epochs > 0
                        and epoch % cfg.train.checkpoint_every_epochs == 0):
                    saver.save_epoch(epoch, state)
                if on_epoch_end:
                    on_epoch_end(epoch, state)
    finally:
        stop.restore()
    saver.finish(state)
    return state


def _start_epoch(cfg: ExperimentConfig, state, steps_per_epoch: int) -> int:
    """Epoch to resume the data stream at (reference adapt_trainer resumes
    its epoch loop at the checkpointed epoch): checkpoints are written at
    epoch boundaries, so the restored per-iteration step counter divides
    evenly; a mid-epoch step rounds down to replay from the boundary."""
    if not cfg.train.resume:
        return 0
    return int(jax.device_get(state.step)) // steps_per_epoch


def train_multitask(
    cfg: ExperimentConfig,
    mesh=None,
    logger: Optional[JsonlLogger] = None,
    max_iterations: Optional[int] = None,
    depth_weight: float = 0.5,
    adapt: bool = True,
    on_epoch_end: Optional[Callable] = None,
    boundary_weight: float = 0.0,
):
    """Multitask (seg + aux depth [+ aux boundary]) training, source-only or
    MCD-adapted (reference: multitask trainer variants, SURVEY.md section 2).

    Depth supervision (meters) rides through the SAME resize/crop/flip as the
    image and label (ops/preprocess with_depth=True), so the aux task sees
    geometry consistent with the segmentation crop. ``boundary_weight > 0``
    adds the boundary-detection head (targets derived on device from the
    source label map — train/multitask.py)."""
    from mcseg_tpu.models.heads import BoundaryDetector
    from mcseg_tpu.train.multitask import (
        init_multitask_state,
        make_multitask_mcd_step,
        make_multitask_source_step,
    )

    b_head = (BoundaryDetector(upsample=cfg.model.upsample,
                               dtype=_dtype_of(cfg.model))
              if boundary_weight > 0 else None)

    mesh = mesh or make_mesh(spatial=cfg.train.spatial_devices)
    out_dir = mkdir_if_not_exist(cfg.train.out_dir)
    logger = logger or make_run_logger(cfg.train)
    tw, th = cfg.data.train_img_shape

    if cfg.train.resume:
        # tiny skeleton: only the optimizer transforms + head module are
        # needed, the parameters come from the checkpoint
        _, tx_g, tx_f, d_head = init_multitask_state(
            cfg.model, cfg.train, jax.random.key(cfg.train.seed),
            img_shape=(16, 16), with_boundary=b_head is not None,
        )
        state, ckpt_cfg = load_checkpoint(cfg.train.resume)
        _check_resume_config(cfg, ckpt_cfg, cfg.train.resume)
        if "D" not in state.params:
            raise ValueError(
                f"--resume {cfg.train.resume!r} is not a multitask checkpoint "
                "(no 'D' depth-head subtree)"
            )
        if (b_head is not None) != ("B" in state.params):
            raise ValueError(
                f"--resume {cfg.train.resume!r}: boundary-head mismatch — "
                f"checkpoint {'has' if 'B' in state.params else 'lacks'} a 'B' "
                f"subtree but --boundary_weight is "
                f"{'set' if b_head is not None else 'unset'}"
            )
    else:
        state, tx_g, tx_f, d_head = init_multitask_state(
            cfg.model, cfg.train, jax.random.key(cfg.train.seed),
            img_shape=(th, tw), with_boundary=b_head is not None,
        )
    state = replicate(mesh, state)
    g, f1, f2 = get_models(cfg.model)
    pp_src = make_train_preprocess(cfg.data, with_depth=True,
                                   compute_dtype=_dtype_of(cfg.model))
    pp_tgt = make_train_preprocess(cfg.data, compute_dtype=_dtype_of(cfg.model))
    data_key = jax.random.key(cfg.train.seed + 1)

    if adapt:
        src = get_dataset(cfg.data.src_dataset, cfg.data, cfg.data.split)
        tgt = get_dataset(cfg.data.tgt_dataset, cfg.data, cfg.data.split)
        dataset = ZipDataset(src, tgt)
        _, tgt_remap, _, _ = get_label_spec(cfg.data.tgt_dataset)
        tgt_remap = host_table(tgt_remap)  # host-side trace-time constant
        inner = make_multitask_mcd_step(
            g, f1, f2, d_head, tx_g, tx_f, cfg.train, depth_weight,
            b_head=b_head, boundary_weight=boundary_weight,
        )

        @functools.partial(jax.jit, donate_argnums=(0,))
        def full_step(state, src_raw, tgt_raw):
            key = jax.random.fold_in(data_key, state.step)
            k_src, k_tgt = jax.random.split(key)
            xs, ys, ds = _spatial(mesh, *pp_src(src_raw, k_src))
            xt, _ = pp_tgt(tgt_raw, k_tgt, remap_table=tgt_remap)
            return inner(state, xs, ys, ds, _spatial(mesh, xt))

    else:
        dataset = get_dataset(cfg.data.src_dataset, cfg.data, cfg.data.split)
        inner = make_multitask_source_step(
            g, f1, f2, d_head, tx_g, tx_f, cfg.train, depth_weight,
            b_head=b_head, boundary_weight=boundary_weight,
        )

        @functools.partial(jax.jit, donate_argnums=(0,))
        def full_step(state, raw):
            key = jax.random.fold_in(data_key, state.step)
            img, label, ds = _spatial(mesh, *pp_src(raw, key))
            return inner(state, img, label, ds)

    timer = StepTimer()
    # resumed runs continue the global step in logs/NaN reports
    step0 = int(jax.device_get(state.step))
    steps_per_epoch = max(len(dataset) // cfg.data.batch_size, 1)
    start_epoch = _start_epoch(cfg, state, steps_per_epoch)
    it = _input_stream(dataset, mesh, cfg, start_epoch)
    stop = _GracefulStop().install(cfg.train.max_hours)
    saver = _EpochSaver(cfg, out_dir)
    try:
        for i, item in enumerate(it):
            if stop.stop or (i > 0 and stop.expired()) or (max_iterations is not None and i >= max_iterations):
                break
            if adapt:
                state, metrics = full_step(state, item[0], item[1])
            else:
                state, metrics = full_step(state, item)
            timer.tick(cfg.data.batch_size)
            if i % cfg.train.log_every == 0:
                host_metrics = jax.device_get(metrics)
                _check_finite(host_metrics, step0 + i)
                logger.log({"step": step0 + i, **host_metrics,
                            "img_per_sec": timer.items_per_sec})
            if (i + 1) % steps_per_epoch == 0:
                epoch = start_epoch + (i + 1) // steps_per_epoch
                if (cfg.train.checkpoint_every_epochs > 0
                        and epoch % cfg.train.checkpoint_every_epochs == 0):
                    saver.save_epoch(epoch, state)
                if on_epoch_end:
                    on_epoch_end(epoch, state)
    finally:
        stop.restore()
    saver.finish(state)
    return state


def train_adapt(
    cfg: ExperimentConfig,
    mesh=None,
    logger: Optional[JsonlLogger] = None,
    max_iterations: Optional[int] = None,
    on_epoch_end: Optional[Callable] = None,
):
    """MCD adaptation training (reference adapt_trainer.py): zipped
    (source, target) batches through the fused A/B/C step."""
    mesh = mesh or make_mesh(spatial=cfg.train.spatial_devices)
    out_dir = mkdir_if_not_exist(cfg.train.out_dir)
    logger = logger or make_run_logger(cfg.train)

    src = get_dataset(cfg.data.src_dataset, cfg.data, cfg.data.split)
    tgt = get_dataset(cfg.data.tgt_dataset, cfg.data, cfg.data.split)
    zipped = ZipDataset(src, tgt)
    state, tx_g, tx_f = _init_or_resume(cfg)
    state = replicate(mesh, state)
    g, f1, f2 = get_models(cfg.model)
    pp = make_train_preprocess(cfg.data, compute_dtype=_dtype_of(cfg.model))
    _, tgt_remap, _, _ = get_label_spec(cfg.data.tgt_dataset)
    tgt_remap = host_table(tgt_remap)  # host-side trace-time constant
    inner = make_mcd_step(
        g, f1, f2, tx_g, tx_f, cfg.train,
        uses_one_classifier=cfg.model.uses_one_classifier,
    )
    data_key = jax.random.key(cfg.train.seed + 1)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def full_step(state, src_raw, tgt_raw):
        key = jax.random.fold_in(data_key, state.step)
        k_src, k_tgt = jax.random.split(key)
        xs, ys = _spatial(mesh, *pp(src_raw, k_src))
        xt, _ = pp(tgt_raw, k_tgt, remap_table=tgt_remap)
        return inner(state, xs, ys, _spatial(mesh, xt))

    timer = StepTimer()
    # resumed runs continue the global step in logs/NaN reports
    step0 = int(jax.device_get(state.step))
    steps_per_epoch = max(len(zipped) // cfg.data.batch_size, 1)
    start_epoch = _start_epoch(cfg, state, steps_per_epoch)
    it = _input_stream(zipped, mesh, cfg, start_epoch)
    stop = _GracefulStop().install(cfg.train.max_hours)
    saver = _EpochSaver(cfg, out_dir)
    try:
        for i, (src_raw, tgt_raw) in enumerate(it):
            if stop.stop or (i > 0 and stop.expired()) or (max_iterations is not None and i >= max_iterations):
                break
            state, metrics = full_step(state, src_raw, tgt_raw)
            timer.tick(cfg.data.batch_size)
            if i % cfg.train.log_every == 0:
                host_metrics = jax.device_get(metrics)
                _check_finite(host_metrics, step0 + i)
                logger.log({"step": step0 + i, **host_metrics,
                            "img_per_sec": timer.items_per_sec})
            if (i + 1) % steps_per_epoch == 0:
                epoch = start_epoch + (i + 1) // steps_per_epoch
                if (cfg.train.checkpoint_every_epochs > 0
                        and epoch % cfg.train.checkpoint_every_epochs == 0):
                    saver.save_epoch(epoch, state)
                if on_epoch_end:
                    on_epoch_end(epoch, state)
    finally:
        stop.restore()
    saver.finish(state)
    return state
