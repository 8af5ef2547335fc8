"""Reference-parity evaluation harness.

The moment a reference torch checkpoint + real corpus exist, this one command
produces the per-class IoU table needed for the +-0.5 pt parity comparison
(BASELINE.md north star): it imports the torch checkpoint (G/F1/F2 state
dicts, first-conv widening if input_ch differs) into the native format and
runs the full evaluator on the given corpus root.

    python -m mcseg_tpu.tools.parity_eval ref_ckpt.pth.tar \
        --dataset nyu --data_root /data --net drn_d_38 --input_ch 6 \
        --n_class 40 [--split val] [--test_img_shape 640 480] [--f1_only]

Prints the per-class IoU table + mIoU (and depth metrics when applicable) and
exits 0; pipe the table next to the reference README's numbers.
"""

from __future__ import annotations

import argparse
import os
import tempfile


def main(argv=None):
    p = argparse.ArgumentParser("parity_eval")
    p.add_argument("torch_checkpoint")
    p.add_argument("--dataset", required=True, help="target corpus (nyu|city|...)")
    p.add_argument("--data_root", required=True)
    p.add_argument("--net", default="drn_d_38")
    p.add_argument("--input_ch", type=int, default=3)
    p.add_argument("--n_class", type=int, default=None)
    p.add_argument("--split", default="val")
    p.add_argument("--test_img_shape", type=int, nargs=2, default=None)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"],
                   help="float32 for bit-exact CPU parity against torch")
    p.add_argument("--f1_only", action="store_true")
    p.add_argument("--outdir", default=None, help="dump label/color PNGs here")
    p.add_argument("--keep_import", default=None,
                   help="write the imported native checkpoint to this prefix "
                        "instead of a temp dir")
    args = p.parse_args(argv)

    from mcseg_tpu.cli import adapt_test, import_torch
    from mcseg_tpu.data.labels import get_label_spec

    n_class = args.n_class or get_label_spec(args.dataset)[0]
    tmp = None
    if args.keep_import:
        prefix = args.keep_import
    else:
        tmp = tempfile.mkdtemp(prefix="parity_import_")
        prefix = os.path.join(tmp, "imported")

    import_torch.main([
        args.torch_checkpoint, prefix,
        "--net", args.net, "--input_ch", str(args.input_ch),
        "--n_class", str(n_class), "--dtype", args.dtype,
    ])

    test_argv = [
        prefix, args.dataset, "--data_root", args.data_root,
        "--split", args.split, "--batch_size", str(args.batch_size),
    ]
    if args.test_img_shape:
        test_argv += ["--test_img_shape", *map(str, args.test_img_shape)]
    if args.f1_only:
        test_argv += ["--f1_only"]
    if args.outdir:
        test_argv += ["--outdir", args.outdir]
    miou = adapt_test.main(test_argv)
    print(f"parity mIoU: {100.0 * miou:.2f}")
    return miou


if __name__ == "__main__":
    main()
