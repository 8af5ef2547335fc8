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
from typing import Dict, Iterator, Optional

import jax
import numpy as np

from mcseg_tpu.parallel.mesh import shard_batch


def _stack(samples) -> Dict[str, np.ndarray]:
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples]) for k in keys}


def batch_iterator(
    dataset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = True,
    epochs: Optional[int] = None,
) -> Iterator:
    """Yield stacked host batches. For ZipDataset items (src, tgt) yields a
    pair of stacked dicts."""
    n = len(dataset)
    if batch_size > n:
        raise ValueError(f"batch_size {batch_size} > dataset size {n}")
    epoch = 0
    rng = np.random.RandomState(seed)
    while epochs is None or epoch < epochs:
        order = rng.permutation(n) if shuffle else np.arange(n)
        stop = n - batch_size + 1 if drop_last else n
        for i in range(0, stop, batch_size):
            idx = order[i : i + batch_size]
            items = [dataset[int(j)] for j in idx]
            if isinstance(items[0], tuple):  # ZipDataset (src, tgt)
                yield _stack([a for a, _ in items]), _stack([b for _, b in items])
            else:
                yield _stack(items)
        epoch += 1


def device_prefetch(host_iter: Iterator, mesh, depth: int = 2) -> Iterator:
    """Overlap host decode/stack + H2D transfer with device compute.

    A daemon thread fills a bounded queue with batches already placed on the
    mesh (sharded on 'data'); consuming code always finds the next batch
    resident in HBM — the TPU analog of pinned-memory + non_blocking copies.
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    err: list = []

    def worker():
        try:
            for item in host_iter:
                if isinstance(item, tuple):
                    q.put(tuple(shard_batch(mesh, b) for b in item))
                else:
                    q.put(shard_batch(mesh, item))
        except Exception as e:  # pragma: no cover
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item
