"""Host input pipeline: decode -> stack -> prefetch -> shard.

The reference uses torch DataLoader worker processes that also do all image
math (SURVEY.md sections 2, 3.4). Here host threads only decode + stack raw
uint8/float arrays (datasets.py already returns fixed-size raw samples);
batches are pushed to device asynchronously (double-buffered queue) and all
image math runs on device (ops/preprocess.py). The returned arrays are global
jax.Arrays sharded on the 'data' mesh axis.
"""

from __future__ import annotations

import queue
import threading
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import jax
import numpy as np

from mcseg_tpu.parallel.mesh import shard_batch


def _stack(samples) -> Dict[str, np.ndarray]:
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples]) for k in keys}


def _stack_items(items):
    if isinstance(items[0], tuple):  # ZipDataset (src, tgt)
        return _stack([a for a, _ in items]), _stack([b for _, b in items])
    return _stack(items)


def _embed_rows(sub: Dict[str, np.ndarray], rows: np.ndarray,
                batch: int) -> Dict[str, np.ndarray]:
    """Scatter a decoded [len(rows), ...] subset into zero-filled full-batch
    arrays. The untouched rows are never read: multihost placement
    (mesh._host_put -> make_array_from_callback) materializes only this
    process's addressable shards, which are exactly ``rows``."""
    out = {}
    for k, v in sub.items():
        full = np.zeros((batch,) + v.shape[1:], v.dtype)
        full[rows] = v
        out[k] = full
    return out


def _embed_items(sub, rows: np.ndarray, batch: int):
    if isinstance(sub, tuple):  # ZipDataset (src, tgt)
        return tuple(_embed_rows(s, rows, batch) for s in sub)
    return _embed_rows(sub, rows, batch)


def _index_batches(n, batch_size, shuffle, seed, drop_last, epochs,
                   start_epoch=0):
    rng = np.random.RandomState(seed)
    # burn the skipped epochs' permutations so a resumed run sees exactly
    # the data stream an uninterrupted run would have seen from here on
    for _ in range(start_epoch if shuffle else 0):
        rng.permutation(n)
    epoch = start_epoch
    while epochs is None or epoch < epochs:
        order = rng.permutation(n) if shuffle else np.arange(n)
        stop = n - batch_size + 1 if drop_last else n
        for i in range(0, stop, batch_size):
            yield order[i : i + batch_size]
        epoch += 1


def batch_iterator(
    dataset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = True,
    epochs: Optional[int] = None,
    num_workers: int = 0,
    prefetch_batches: int = 2,
    start_epoch: int = 0,
    local_rows: Optional[np.ndarray] = None,
) -> Iterator:
    """Yield stacked host batches. For ZipDataset items (src, tgt) yields a
    pair of stacked dicts.

    ``start_epoch`` fast-forwards the stream for ``--resume``: the iterator
    reproduces epochs [start_epoch, epochs) of the uninterrupted run (the
    reference's adapt_trainer continues its epoch loop at the checkpointed
    epoch the same way), so resume is deterministic end to end.

    ``local_rows`` (multihost, from ``parallel.mesh.local_batch_rows``):
    decode ONLY these rows of each batch, zero-filling the rest — the
    sampler still draws the identical global index stream on every process,
    but per-host decode work drops from O(global batch) to O(local batch).
    Correctness rests on the placement layer reading only the addressable
    rows (see ``_embed_rows``); the 2-process bit-equality tests
    (tests/test_multihost.py) run through this path.

    ``num_workers > 1`` decodes samples on a thread pool — the TPU-native
    counterpart of the reference's ``DataLoader(num_workers=N)`` forked
    workers. Threads (not processes) suffice here because the per-sample work
    is file decode in the native C++ library (ctypes releases the GIL) or
    PIL/numpy (also GIL-releasing); ``prefetch_batches`` batches are kept
    in flight so the pool stays busy while the consumer stacks/uploads.
    Sample order is identical to the serial path for a given seed.
    """
    n = len(dataset)
    if batch_size > n:
        raise ValueError(f"batch_size {batch_size} > dataset size {n}")
    idx_iter = _index_batches(n, batch_size, shuffle, seed, drop_last, epochs,
                              start_epoch)

    if local_rows is not None and len(local_rows) >= batch_size:
        local_rows = None  # every row is local: plain path
    rows = None if local_rows is None else np.asarray(local_rows)

    def sel(idx):
        # a drop_last=False tail batch is shorter than batch_size; its rows
        # don't line up with the full-batch sharding, so decode it whole
        if rows is None or len(idx) < batch_size:
            return idx
        return np.asarray(idx)[rows]

    def emb(stacked, batch):
        if rows is None or batch < batch_size:
            return stacked
        return _embed_items(stacked, rows, batch)

    # Whole-batch fast path (datasets.get_batch): one ctypes call per plane
    # into the native decoder's own thread pool, decoding straight into the
    # final [N, ...] buffers — no per-sample Python objects, no np.stack copy.
    # Identical sample order to the per-sample path for a given seed.
    batched = getattr(dataset, "get_batch", None)

    if num_workers <= 1:
        if batched is not None:
            for idx in idx_iter:
                yield emb(batched(sel(idx)), len(idx))
        else:
            for idx in idx_iter:
                yield emb(_stack_items([dataset[int(j)] for j in sel(idx)]),
                          len(idx))
        return

    ex = ThreadPoolExecutor(num_workers, thread_name_prefix="mcseg-decode")
    try:
        pending: deque = deque()
        if batched is not None:
            # one future per batch; the native layer threads across samples
            # inside the call (and releases the GIL), so the pool only needs
            # to keep prefetch_batches decodes in flight
            for idx in idx_iter:
                pending.append((ex.submit(batched, sel(idx)), len(idx)))
                if len(pending) > prefetch_batches:
                    f, b = pending.popleft()
                    yield emb(f.result(), b)
            while pending:
                f, b = pending.popleft()
                yield emb(f.result(), b)
            return
        for idx in idx_iter:  # each entry: list of per-sample futures
            pending.append(
                ([ex.submit(dataset.__getitem__, int(j)) for j in sel(idx)],
                 len(idx)))
            if len(pending) > prefetch_batches:
                fs, b = pending.popleft()
                yield emb(_stack_items([f.result() for f in fs]), b)
        while pending:
            fs, b = pending.popleft()
            yield emb(_stack_items([f.result() for f in fs]), b)
    finally:
        try:
            ex.shutdown(wait=False, cancel_futures=True)
        except Exception:  # interpreter teardown: queue module already gone
            pass


def wire_format(batch: Dict[str, np.ndarray], drop_label: bool = False
                ) -> Dict[str, np.ndarray]:
    """Compact the host batch for the host->device transfer.

    Depth is re-encoded float32 meters -> uint16 millimeters (the corpus
    storage precision; ops/preprocess.depth_to_meters decodes it back on
    device), halving its bytes. ``drop_label`` removes the label plane for
    unlabeled (target-domain) batches — MCD never reads target labels, so
    shipping them is pure wasted PCIe/HBM bandwidth.
    """
    out = {}
    for k, v in batch.items():
        if k == "label" and drop_label:
            continue
        if k == "depth" and v.dtype == np.float32:
            v = (np.clip(v, 0.0, 65.535) * 1000.0 + 0.5).astype(np.uint16)
        out[k] = v
    return out


def device_prefetch(host_iter: Iterator, mesh, depth: int = 2,
                    compact_wire: bool = True) -> Iterator:
    """Overlap host decode/stack + H2D transfer with device compute.

    A daemon thread fills a bounded queue with batches already placed on the
    mesh (sharded on 'data'); consuming code always finds the next batch
    resident in HBM — the TPU analog of pinned-memory + non_blocking copies.

    ``compact_wire`` applies ``wire_format`` before the transfer: uint16-mm
    depth always, and label dropped from the SECOND element of (src, tgt)
    tuples (the unlabeled target domain).
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    err: list = []
    closed = threading.Event()

    def _put(x) -> bool:
        # bounded put that notices consumer abandonment: a loop that breaks
        # early (graceful stop, max_iterations) GC's this generator, and the
        # worker must exit instead of blocking on a full queue forever
        # (thread + decode-executor leak in long-lived processes)
        while not closed.is_set():
            try:
                q.put(x, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in host_iter:
                if isinstance(item, tuple):
                    if compact_wire:
                        item = tuple(
                            wire_format(b, drop_label=(i == 1))
                            for i, b in enumerate(item)
                        )
                    if not _put(tuple(shard_batch(mesh, b) for b in item)):
                        return
                else:
                    if compact_wire:
                        item = wire_format(item)
                    if not _put(shard_batch(mesh, item)):
                        return
        except Exception as e:  # pragma: no cover
            err.append(e)
        finally:
            _put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        closed.set()
