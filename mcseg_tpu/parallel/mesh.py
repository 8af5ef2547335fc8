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

Spatial partitioning (2-D mesh): ``make_mesh(spatial=s)`` lays the devices
out as Mesh((n/s, s), ('data', 'space')) and ``constrain_spatial`` hints
GSPMD to shard activations' HEIGHT dim over 'space' inside the jit'd step —
XLA then inserts the conv halo exchanges and the cross-shard BN/loss
reductions automatically (the GSPMD spatial-partitioning path; no manual
collectives). This is how geometries too large for one chip's HBM — or
effective per-chip batches below one image — train: 'data' carries the
batch, 'space' carries rows of every activation. The host pipeline is
untouched: inputs arrive batch-sharded as before and GSPMD reshards them at
the constraint point.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None,
              spatial: int = 1) -> Mesh:
    """1-D data-parallel mesh, or 2-D (data, space) when ``spatial > 1``.
    ``n_devices=None`` uses all local devices — a v5e-8 host yields
    Mesh((8,), ('data',)) with collectives riding ICI; ``spatial=4`` on the
    same host yields Mesh((2, 4), ('data', 'space'))."""
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
    if spatial > 1:
        if len(devices) % spatial:
            raise ValueError(
                f"spatial={spatial} does not divide the {len(devices)}-device "
                "mesh")
        arr = np.asarray(devices).reshape(len(devices) // spatial, spatial)
        return Mesh(arr, (DATA_AXIS, SPACE_AXIS))
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def spatial_size(mesh: Mesh) -> int:
    """Extent of the 'space' axis (1 on data-parallel-only meshes)."""
    return mesh.shape.get(SPACE_AXIS, 1)


def constrain_spatial(mesh: Mesh, x, h_axis: int = 1):
    """Hint GSPMD to shard ``x``'s height dim over 'space' (batch stays on
    'data'). No-op on 1-D meshes, so train steps can apply it
    unconditionally. Works on [B,H,W,C] activations and [B,H,W] label /
    depth planes alike. H must be divisible by the 'space' extent at every
    level of the network (the standard strides keep powers of two, so
    spatial=2/4/8 with the usual 480/512-row geometries divides cleanly)."""
    if spatial_size(mesh) == 1:
        return x
    spec = [None] * x.ndim
    spec[0] = DATA_AXIS
    spec[h_axis] = SPACE_AXIS
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) across the data axis; all other axes replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _host_put(tree, sh: NamedSharding):
    """Place host arrays onto the mesh under ``sh``.

    Single-process: plain ``jax.device_put`` (the measured fast path — one
    transfer per device shard). Multi-process (multihost.py): a process can
    only write its own chips, so build the global array with
    ``jax.make_array_from_callback`` — the callback is invoked once per
    ADDRESSABLE shard with that shard's global index, and the runtime
    assembles the logical global array. Every process must hold the same
    host-side global value (guaranteed here by the shared sampler RNG /
    replicated corpus files) and supplies just its slice of it.
    """
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), tree)

    def put(x):
        # typed PRNG keys (train state rng) can't pass through np.asarray:
        # place the raw key payload, then re-wrap
        if isinstance(x, jax.Array) and jax.dtypes.issubdtype(
                x.dtype, jax.dtypes.prng_key):
            impl = jax.random.key_impl(x)
            kd = np.asarray(jax.random.key_data(x))
            arr = jax.make_array_from_callback(
                kd.shape, sh, lambda idx: kd[idx])
            return jax.random.wrap_key_data(arr, impl=impl)
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    return jax.tree.map(put, tree)


def local_batch_rows(mesh: Mesh, global_batch: int):
    """Rows of a batch-sharded [B, ...] array THIS process materializes.

    ``None`` single-process (= all rows). Under multihost,
    ``make_array_from_callback`` (``_host_put``) only ever reads the
    addressable shards' rows, so the host pipeline can skip decoding the
    rest — turning per-host decode from O(global batch) into O(local batch)
    (``data/pipeline.py:batch_iterator`` ``local_rows``) while the assembled
    global array, and therefore the training math, stays bit-identical.
    """
    if jax.process_count() == 1:
        return None
    sh = batch_sharding(mesh)
    rows = set()
    for idx in sh.addressable_devices_indices_map((global_batch,)).values():
        (sl,) = idx
        rows.update(range(*sl.indices(global_batch)))
    return np.asarray(sorted(rows), dtype=np.int64)


def shard_batch(mesh: Mesh, batch):
    """Place a host-side pytree of arrays onto the mesh, batch-sharded.

    Equivalent role to the reference's ``.cuda()`` host->device boundary
    (SURVEY.md section 3.1) but produces a single global jax.Array whose shards
    live on all mesh devices (all processes' devices under multihost).
    """
    return _host_put(batch, batch_sharding(mesh))


def replicate(mesh: Mesh, tree):
    return _host_put(tree, replicated_sharding(mesh))
