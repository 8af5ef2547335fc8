"""Standalone evaluation of dumped predictions (reference: standalone
eval.py [?], SURVEY.md section 2): compute the per-class IoU table from a
directory of predicted label PNGs vs a directory of ground-truth label PNGs.

    python -m mcseg_tpu.cli.evaluate_preds preds/ gt/ --dataset nyu
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np
from PIL import Image

from mcseg_tpu.data.labels import get_label_spec, remap
from mcseg_tpu.eval.metrics import format_iou_table, miou_from_hist


def main(argv=None):
    p = argparse.ArgumentParser("evaluate_preds")
    p.add_argument("pred_dir")
    p.add_argument("gt_dir")
    p.add_argument("--dataset", default="nyu",
                   help="label space: nyu|suncg|city|gta5")
    p.add_argument("--gt_raw", action="store_true",
                   help="GT PNGs hold raw corpus ids (apply the remap table)")
    args = p.parse_args(argv)

    n_class, table, names, _ = get_label_spec(args.dataset)
    preds = sorted(glob.glob(os.path.join(args.pred_dir, "*_label.png"))) or sorted(
        glob.glob(os.path.join(args.pred_dir, "*.png"))
    )
    if not preds:
        raise FileNotFoundError(f"no prediction PNGs in {args.pred_dir}")

    hist = np.zeros((n_class, n_class), np.int64)
    n_used = 0
    for pred_path in preds:
        stem = os.path.basename(pred_path).replace("_label", "")
        gt_path = os.path.join(args.gt_dir, stem)
        if not os.path.exists(gt_path):
            continue
        pred = np.asarray(Image.open(pred_path)).astype(np.int64)
        gt = np.asarray(Image.open(gt_path)).astype(np.int64)
        if args.gt_raw:
            gt = remap(gt, table).astype(np.int64)
        valid = (gt >= 0) & (gt < n_class)
        idx = gt[valid] * n_class + np.clip(pred[valid], 0, n_class - 1)
        hist += np.bincount(idx, minlength=n_class * n_class).reshape(n_class, n_class)
        n_used += 1
    if n_used == 0:
        raise FileNotFoundError("no (pred, gt) filename matches")
    print(f"evaluated {n_used} images")
    print(format_iou_table(hist, names[:n_class]))
    return miou_from_hist(hist)


if __name__ == "__main__":
    main()
