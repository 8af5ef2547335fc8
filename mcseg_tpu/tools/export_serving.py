"""Export a checkpoint's inference path as a self-contained serving artifact.

    python -m mcseg_tpu.tools.export_serving runs/suncg2nyu/last \
        --out model.shlo --batch 1 --platforms tpu,cpu [--with_probs] \
        [--out_shape H W] [--f1_only]

Writes ``model.shlo`` (serialized jax.export StableHLO — parameters baked in
as constants) and ``model.shlo.json`` (manifest: input spec, platforms,
calling-convention version). Load anywhere with:

    from mcseg_tpu.eval.serving import load_serving
    pred = load_serving("model.shlo")({"image": uint8_batch})

or, framework-free, ``jax.export.deserialize(open(p,'rb').read()).call``.
See eval/serving.py for the design rationale.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    from mcseg_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser(
        "export_serving", description="AOT-export a checkpoint for serving")
    p.add_argument("checkpoint", help="checkpoint prefix (without .msgpack)")
    p.add_argument("--out", required=True, help="artifact output path")
    p.add_argument("--batch", default="1",
                   help="static batch size of the exported graph; a comma "
                        "list (e.g. 1,8,32) writes one artifact per size "
                        "(<out>.b<N>) for a bucketing server")
    p.add_argument("--platforms", default="tpu,cpu",
                   help="comma-separated lowering platforms")
    p.add_argument("--out_shape", type=int, nargs=2, default=None,
                   metavar=("H", "W"),
                   help="prediction-map resolution (default: test_img_shape)")
    p.add_argument("--with_probs", action="store_true",
                   help="also return the softmax probability maps")
    p.add_argument("--f1_only", action="store_true",
                   help="serve F1 alone instead of averaging F1/F2")
    p.add_argument("--extra_plane", default=None,
                   choices=("depth", "hha", "ir"),
                   help="non-RGB input plane kind (default: resolved from "
                        "the checkpoint config — must match training)")
    p.add_argument("--no_depth_head", action="store_true",
                   help="multitask checkpoints serve their aux metric-depth "
                        "map by default; this opts out (pred only)")
    args = p.parse_args(argv)

    from mcseg_tpu.eval.serving import export_serving
    from mcseg_tpu.utils.checkpoint import load_checkpoint

    state, cfg = load_checkpoint(args.checkpoint)
    try:
        batches = [int(s) for s in str(args.batch).split(",") if s.strip()]
    except ValueError:
        p.error(f"--batch must be an int or comma list of ints, got "
                f"{args.batch!r}")
    if not batches:
        p.error(f"--batch parsed to no sizes: {args.batch!r}")
    manifests = []
    for b in batches:
        # one artifact per size: a bucketing server picks by request batch
        out = args.out if len(batches) == 1 else f"{args.out}.b{b}"
        manifest = export_serving(
            cfg, state.params, state.batch_stats, out,
            batch=b,
            platforms=tuple(s.strip() for s in args.platforms.split(",")
                            if s.strip()),
            average_classifiers=not args.f1_only,
            out_shape=tuple(args.out_shape) if args.out_shape else None,
            with_probs=args.with_probs,
            extra_plane=args.extra_plane,
            with_depth=False if args.no_depth_head else None,
        )
        print(f"wrote {out} ({manifest['bytes']} bytes) "
              f"platforms={manifest['platforms']} "
              f"input={manifest['input_spec']} -> {manifest['output']}")
        manifests.append(manifest)
    return manifests[0] if len(manifests) == 1 else manifests


if __name__ == "__main__":
    main()
