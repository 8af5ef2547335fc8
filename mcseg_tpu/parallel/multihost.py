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

Design choice — every process runs the SAME sampler RNG (the data stream is
bit-identical to the single-process run by construction, the property every
fp64 equality test in this repo is built on) but decodes ONLY its local
rows: the train loops pass `parallel.mesh.local_batch_rows(mesh, B)` into
`data/pipeline.py:batch_iterator(local_rows=...)`, which zero-fills the
non-local rows — safe because `make_array_from_callback` reads exactly the
addressable shards' rows. Per-host decode work is therefore O(local batch)
at any process count (r4 shipped O(global batch); the 2-process
bit-equality tests now run through the local-rows path). The HBM-resident
corpus path still stages the full corpus per process at startup — decode
once, then index-fed steps ship ~no bytes, so its steady state never
depends on host decode rate.

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
    if jax.process_count() > 1:
        # Eagerly build the cross-process collective context NOW, while
        # every process is provably at the same point (initialize() returns
        # once all processes have joined the coordinator). The context is
        # otherwise created lazily inside the FIRST collective of the first
        # jit'd step — whose rendezvous has a ~30 s deadline, while the
        # processes can arrive minutes apart (one hits a warm XLA compile
        # cache, another compiles cold), failing the run with
        # "Gloo context initialization ... GetKeyValue() timed out".
        # One tiny symmetric all-reduce here makes every later collective
        # reuse the established context, so compile skew can't kill it.
        sync("mcseg:collective-context-warmup")


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
