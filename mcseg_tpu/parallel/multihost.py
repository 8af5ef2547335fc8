"""Multi-host (multi-process) data parallelism over DCN + ICI.

The reference's only distribution surface is single-process DataParallel
(SURVEY.md section 2). On TPU fleets the corresponding production shape is a
*pod slice*: several hosts, each driving its local chips, one JAX process per
host, collectives riding ICI within a slice and DCN across hosts. JAX's
runtime makes this almost free for the SPMD design this framework already
has — `jax.distributed.initialize` connects the processes, `jax.devices()`
becomes the GLOBAL device list, and the existing 'data' mesh simply spans
every chip in the job. The only host-side work is placement: a process can
only materialize shards that live on its own chips, so
`parallel/mesh.py:shard_batch/replicate` switch from `jax.device_put` to
`jax.make_array_from_callback` when `jax.process_count() > 1` (each process
materializes exactly its addressable rows of the same deterministic global
batch), and checkpoint/log writes are gated to process 0.

Design choice — every process runs the SAME sampler RNG and decodes the full
global batch, then contributes only its local rows. Per-host decode work is
therefore O(global batch) rather than O(local batch): at v5e host:chip
ratios (1:4/1:8) and the measured decode tiers (disk-cache assembly ~20x the
device rate, native decoder ~2.2x on ONE sandbox core) the host stays far
from the bottleneck, and the data stream is bit-identical to the
single-process run by construction — the property every fp64 equality test
in this repo is built on. A local-rows-only decode is a contained future
optimization inside `batch_iterator` if a corpus ever outruns it.

Usage (one command per host):

    mcseg-adapt-train gta5 cityscapes --coordinator host0:9988 \
        --num_processes 4 --process_id $SLURM_PROCID ...

On Cloud TPU pod slices the three flags can be omitted (`--multihost` alone):
`jax.distributed.initialize()` auto-discovers the topology from the TPU
metadata. Verified end to end by `tests/test_multihost.py`: two real OS
processes (Gloo-connected CPU backend, 4 virtual devices each) train and
checkpoint bit-identically to the single-process 8-device run.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Connect this process to the job. Call once, before the first real
    jax API use (backends must not be initialized yet). With all arguments
    None, relies on the environment (TPU pod metadata / cluster envvars)."""
    if coordinator is None and num_processes is None and process_id is None:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )


def maybe_initialize_from_args(args) -> None:
    """CLI entry hook: connect if any multihost flag is set, else no-op
    (single-process runs stay exactly as before — no coordinator, no Gloo)."""
    multihost = getattr(args, "multihost", False)
    coord = getattr(args, "coordinator", None)
    if not (multihost or coord):
        return
    initialize(
        coordinator=coord,
        num_processes=getattr(args, "num_processes", None),
        process_id=getattr(args, "process_id", None),
    )


def is_primary() -> bool:
    """True on the process that owns side effects (checkpoints, JSONL/TB
    logs, stdout tables). Always true single-process."""
    return jax.process_index() == 0


def sync(name: str = "mcseg") -> None:
    """Barrier across all processes (no-op single-process). Used after the
    final checkpoint write so no process exits (and e.g. tears down a
    preempted VM) while process 0 is still flushing to shared storage."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
