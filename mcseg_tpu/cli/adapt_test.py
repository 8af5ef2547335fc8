"""Adapted-checkpoint evaluation entry point (reference: adapt_tester.py).

Rebuilds the model FROM THE CONFIG EMBEDDED IN THE CHECKPOINT, averages the
two classifiers' logits, prints the per-class IoU table, and optionally dumps
raw-label + colorized PNGs.

    python -m mcseg_tpu.cli.adapt_test runs/run0/last nyu --outdir preds/
"""

import dataclasses

from mcseg_tpu.cli.argparse_compat import get_testing_parser
from mcseg_tpu.data.datasets import get_dataset
from mcseg_tpu.eval.tester import evaluate
from mcseg_tpu.utils.checkpoint import load_checkpoint


def main(argv=None, average_classifiers=None):
    """``average_classifiers``: None resolves from the flags — adapt_test
    defaults to averaging F1/F2 (the reference adapt_tester behavior) unless
    --f1_only; source_test passes False and --use_f2 opts back in."""
    from mcseg_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    args = get_testing_parser("adapt_test").parse_args(argv)
    if average_classifiers is None:
        average_classifiers = not args.f1_only
    if args.use_f2:
        average_classifiers = True
    state, cfg = load_checkpoint(args.checkpoint)
    data = cfg.data
    overrides = {}
    if args.tgt_dataset:
        overrides["tgt_dataset"] = args.tgt_dataset
    if args.data_root:
        overrides["data_root"] = args.data_root
    if args.batch_size:
        overrides["batch_size"] = args.batch_size
    if args.test_img_shape:
        overrides["test_img_shape"] = tuple(args.test_img_shape)
    if args.max_samples:
        overrides["max_samples"] = args.max_samples
    if overrides:
        data = dataclasses.replace(data, **overrides)
        cfg = dataclasses.replace(cfg, data=data)
    dataset = get_dataset(data.tgt_dataset, data, args.split)
    mesh = None
    if args.all_devices:
        from mcseg_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    miou, hist, table = evaluate(
        state, cfg, dataset,
        average_classifiers=average_classifiers,
        save_dir=args.outdir,
        saves_prob=args.saves_prob,
        mesh=mesh,
        submit_dir=args.submit_dir,
    )
    return miou


if __name__ == "__main__":
    main()
