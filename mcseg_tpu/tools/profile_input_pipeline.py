"""Per-stage breakdown of the host input-pipeline assembly path.

The observability tool behind the disk-cache steady-state work (VERDICT r3
#6 / SURVEY.md §3.4 input-pipeline inversion): reproduces bench.py's
``host_capacity_disk_cache`` configuration (RAM cache off, decoded-corpus
disk cache on, epoch >= 2) against a real or synthetic corpus and times each
assembly stage of one batch — memmap ``has_many`` / per-plane fancy-index
``get_many`` / full ``get_batch`` / ``ZipDataset`` pair / ``wire_format`` —
then the ``batch_iterator`` steady state over >=3 windows with the
``io_stats`` tier counters that prove which tier served them.

    python -m mcseg_tpu.tools.profile_input_pipeline \
        --data_root /tmp/corpus --synth 48 --batch 24 --img_shape 640x480

This is how the round-4 45 -> ~1250 img/s fix was found: the mmap read was
~6 ms/batch, but ``get_batch`` built per-sample dict copies solely for the
(disabled or full) RAM tier's ``_cache_put`` to reject — dead copies of
b x ~2.5 MB per batch (see ``SegDataset._cache_accepting``).
"""

from __future__ import annotations

import argparse
import os
import statistics
import time


def _synth_corpus(root: str, n: int, w: int, h: int) -> None:
    """NYU-layout synthetic PNG corpus (rgb + label + 16-bit-mm depth),
    idempotent via a .complete marker recording (n, w, h)."""
    import numpy as np
    from PIL import Image

    done = os.path.join(root, ".complete")
    if os.path.exists(done):
        with open(done) as f:
            parts = f.read().strip().split(",")
        if len(parts) == 3 and all(p.isdigit() for p in parts):
            have_n, have_w, have_h = (int(p) for p in parts)
            if have_n >= n and (have_w, have_h) == (w, h):
                return
    for sub in ("train_rgb", "train_label", "train_depth"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        rgb = rng.randint(0, 255, (h, w, 3), np.uint8)
        lbl = rng.randint(0, 41, (h, w)).astype(np.uint8)
        depth = (rng.rand(h, w) * 4000 + 500).astype(np.uint16)
        Image.fromarray(rgb).save(os.path.join(root, "train_rgb", f"{i:05d}.png"))
        Image.fromarray(lbl).save(os.path.join(root, "train_label", f"{i:05d}.png"))
        Image.fromarray(depth).save(os.path.join(root, "train_depth", f"{i:05d}.png"))
    with open(done, "w") as f:
        f.write(f"{n},{w},{h}")


def _timeit(fn, n: int = 20) -> float:
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) * 1e3  # ms


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--data_root", required=True,
                   help="corpus root (NYU layout: <split>_rgb/label/depth)")
    p.add_argument("--dataset", default="nyu")
    p.add_argument("--split", default="train")
    p.add_argument("--synth", type=int, default=0, metavar="N",
                   help="synthesize an N-image corpus at --img_shape first")
    p.add_argument("--batch", type=int, default=24)
    p.add_argument("--img_shape", default="640x480", metavar="WxH")
    p.add_argument("--input_ch", type=int, default=6)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--disk_cache_gb", type=float, default=8.0)
    p.add_argument("--windows", type=int, default=3)
    p.add_argument("--steps_per_window", type=int, default=6)
    args = p.parse_args(argv)
    w, h = (int(v) for v in args.img_shape.split("x"))
    b = args.batch

    import numpy as np

    from mcseg_tpu.core.config import DataConfig
    from mcseg_tpu.data.datasets import ZipDataset, get_dataset
    from mcseg_tpu.data.pipeline import batch_iterator, wire_format

    if args.synth:
        _synth_corpus(args.data_root, args.synth, w, h)

    cfg = DataConfig(
        src_dataset=args.dataset, tgt_dataset=args.dataset, batch_size=b,
        train_img_shape=(w, h), input_ch=args.input_ch,
        num_workers=args.num_workers, data_root=args.data_root,
        decode_cache_gb=0.0, decode_disk_cache_gb=args.disk_cache_gb,
        decode_disk_cache_dir=os.path.join(args.data_root, ".profile_dcache"))
    src = get_dataset(args.dataset, cfg, args.split)
    tgt = get_dataset(args.dataset, cfg, args.split)
    src.decode_size = tgt.decode_size = (w, h)
    tgt._disk = src._disk  # same corpus + geometry: share the cache
    n = len(src)
    if n < b:
        raise SystemExit(f"corpus has {n} images < batch {b}")

    # epoch 1 fills the disk cache (one-time decode cost, not profiled)
    it = batch_iterator(ZipDataset(src, tgt), b, seed=0,
                        num_workers=args.num_workers)
    for _ in range(n // b + 1):
        next(it)
    del it
    idx = list(range(b))
    disk = src._disk
    if disk is None or not disk.has_many(idx):
        raise SystemExit("disk cache did not fill — is --disk_cache_gb "
                         "large enough for this corpus?")

    print(f"per-batch stage timings (ms, median of 20), batch={b} @ {w}x{h}:")
    print(f"  has_many            {_timeit(lambda: disk.has_many(idx)):8.2f}")
    for name, m in disk._maps.items():
        ix = np.asarray(idx)
        print(f"  get_many[{name:7s}]  "
              f"{_timeit(lambda m=m, ix=ix: np.asarray(m[ix])):8.2f}")
    print(f"  get_many (all)      {_timeit(lambda: disk.get_many(idx)):8.2f}")
    print(f"  ds.get_batch        {_timeit(lambda: src.get_batch(idx)):8.2f}")
    zd = ZipDataset(src, tgt)
    print(f"  zip.get_batch       {_timeit(lambda: zd.get_batch(idx)):8.2f}")
    batch = src.get_batch(idx)
    print(f"  wire_format(src)    {_timeit(lambda: wire_format(batch)):8.2f}")
    print(f"  wire_format(tgt,dl) "
          f"{_timeit(lambda: wire_format(batch, drop_label=True)):8.2f}")

    # steady state through batch_iterator (bench.py's benched number)
    it = batch_iterator(ZipDataset(src, tgt), b, seed=0,
                        num_workers=args.num_workers)
    for _ in range(n // b + 1):
        next(it)
    rates = []
    dec0 = src.io_stats["decodes"] + tgt.io_stats["decodes"]
    for _ in range(args.windows):
        t0 = time.perf_counter()
        for _ in range(args.steps_per_window):
            next(it)
        rates.append(2.0 * b * args.steps_per_window
                     / (time.perf_counter() - t0))
    dec = src.io_stats["decodes"] + tgt.io_stats["decodes"] - dec0
    print(f"  batch_iterator steady state: {[round(r, 1) for r in rates]} "
          f"img/s, median {statistics.median(rates):.1f}")
    print("  io_stats src:", src.io_stats, " tgt:", tgt.io_stats)
    print(f"  timed-window decodes: {dec} "
          f"({'disk tier served everything' if dec == 0 else 'NOT warm'})")


if __name__ == "__main__":
    main()
