"""Device mesh + sharding rules — the framework's communication layer.

The reference has NO first-party distribution (SURVEY.md section 2: optional
single-process ``torch.nn.DataParallel`` behind ``--is_data_parallel``, nothing
else). The TPU-native equivalent is a 1-D ``jax.sharding.Mesh`` over the
``'data'`` axis: the global batch is sharded on axis 0, parameters and
optimizer states are replicated, and XLA inserts the gradient ``psum`` over ICI
automatically when the jit'd train step is annotated with these shardings.

All of training goes through three primitives:
  * ``make_mesh(n)``       — build the mesh (defaults to every local device).
  * ``batch_sharding``     — NamedSharding P('data', ...) for inputs.
  * ``replicated_sharding``— NamedSharding P() for params / opt state.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh. ``n_devices=None`` uses all local devices —
    a v5e-8 host yields Mesh((8,), ('data',)) with collectives riding ICI."""
    if devices is None:
        try:
            devices = jax.devices()
        except RuntimeError:
            # Broken/unavailable default backend (e.g. a TPU tunnel with a
            # libtpu version mismatch) must not kill a CPU-only dryrun.
            devices = jax.devices("cpu")
        if n_devices is not None and n_devices > len(devices):
            # Simulated multi-chip: fall back to host CPU devices (present when
            # --xla_force_host_platform_device_count is set) so sharding tests
            # and driver dry-runs work with one real chip.
            try:
                cpu = jax.devices("cpu")
            except RuntimeError:
                cpu = []
            if len(cpu) >= n_devices:
                devices = cpu
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices but only {len(devices)} available"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) across the data axis; all other axes replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host-side pytree of arrays onto the mesh, batch-sharded.

    Equivalent role to the reference's ``.cuda()`` host->device boundary
    (SURVEY.md section 3.1) but produces a single global jax.Array whose shards
    live on all mesh devices.
    """
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
