"""Serving forward-only throughput on the local accelerator.

Reproduces the docs/SERVING.md measurement: random-weight model, random raw
planes resident on device, N timed windows through the jit'd serving graph
(`eval/serving.make_serve_fn` — the same graph `export_serving` freezes).
Forward-only: no host I/O, no decode — this isolates the device graph, the
number an HTTP host in front of a warm artifact converges to as client
concurrency saturates the chip.

    python -m mcseg_tpu.tools.bench_serving --net drn_d_38 --input_ch 6 \
        --img_shape 640 480 --batch 24

Prints per-window rates plus one JSON summary line (median window). The
``--no_average`` flag disables classifier-head pooling
(`eval/tester._averaged_head_params`) for A/B runs; with pooling the
recorded v5e number is 485 img/s/chip vs 463 two-apply (640x480 batch 24).
"""

from __future__ import annotations

import argparse
import json
import statistics
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--net", default="drn_d_38")
    p.add_argument("--input_ch", type=int, default=6)
    p.add_argument("--n_class", type=int, default=40)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--img_shape", type=int, nargs=2, default=(640, 480),
                   metavar=("W", "H"))
    p.add_argument("--batch", type=int, default=24)
    p.add_argument("--fusion", default="single", choices=("single", "late"))
    p.add_argument("--windows", type=int, default=3)
    p.add_argument("--iters", type=int, default=10, help="batches per window")
    p.add_argument("--no_average", action="store_true",
                   help="disable classifier-head pooling (A/B baseline)")
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from mcseg_tpu.core.config import (DataConfig, ExperimentConfig,
                                       ModelConfig, TrainConfig)
    from mcseg_tpu.eval.serving import make_serve_fn
    from mcseg_tpu.train.state import create_train_state

    w, h = args.img_shape
    b = args.batch
    cfg = ExperimentConfig(
        model=ModelConfig(net=args.net, input_ch=args.input_ch,
                          n_class=args.n_class, dtype=args.dtype,
                          fusion=args.fusion, s2d="auto"),
        data=DataConfig(src_dataset="synthetic", tgt_dataset="synthetic",
                        batch_size=b, train_img_shape=(w, h),
                        test_img_shape=(w, h), input_ch=args.input_ch),
        train=TrainConfig(),
    )
    state, _, _ = create_train_state(cfg.model, cfg.train, jax.random.key(0),
                                     img_shape=(h, w))
    serve = jax.jit(make_serve_fn(cfg, state.params, state.batch_stats))

    r = np.random.RandomState(0)
    batch = {"image": r.randint(0, 255, (b, h, w, 3)).astype(np.uint8)}
    if args.input_ch in (1, 6, 7):
        batch["depth"] = r.rand(b, h, w).astype(np.float32) * 3 + 0.5
    if args.input_ch == 7:
        batch["boundary"] = (r.rand(b, h, w) > 0.9).astype(np.uint8)
    batch = jax.device_put(batch)

    import mcseg_tpu.eval.tester as tester

    orig_pool = tester._averaged_head_params
    if args.no_average:
        # disable head pooling for the A/B baseline. The override must be
        # live while jit TRACES the graph — i.e. during the first call —
        # and is restored right after so in-process callers (tests) don't
        # inherit it.
        tester._averaged_head_params = lambda *a: None
    try:
        out = serve(batch)  # compile + warm
        jax.block_until_ready(out)
    finally:
        tester._averaged_head_params = orig_pool
    rates = []
    for wi in range(args.windows):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = serve(batch)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        rates.append(b * args.iters / dt)
        print(f"window {wi}: {rates[-1]:.1f} img/s/chip "
              f"({dt / args.iters * 1e3:.1f} ms/batch)")
    print(json.dumps({
        "metric": f"serving_images_per_sec_per_chip_{w}x{h}",
        "value": round(statistics.median(rates), 1),
        "unit": "images/sec/chip",
        "net": args.net, "batch": b, "input_ch": args.input_ch,
        "averaged_head": not args.no_average,
        "device": getattr(jax.devices()[0], "device_kind", "?"),
    }))


if __name__ == "__main__":
    main()
