"""Qualitative result sheets: tile input | GT | prediction side by side.

Counterpart of the reference's visualization tooling (SURVEY.md section 2).

    python -m mcseg_tpu.tools.make_result_sheet <rgb_dir> <gt_dir> <pred_dir> <out_dir> \
        --dataset nyu
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np
from PIL import Image

from mcseg_tpu.data.labels import get_label_spec
from mcseg_tpu.data.transforms import colorize


def main(argv=None):
    p = argparse.ArgumentParser("make_result_sheet")
    p.add_argument("rgb_dir")
    p.add_argument("gt_dir")
    p.add_argument("pred_dir")
    p.add_argument("out_dir")
    p.add_argument("--dataset", default="nyu")
    p.add_argument("--limit", type=int, default=50)
    args = p.parse_args(argv)

    _, _, _, palette = get_label_spec(args.dataset)
    os.makedirs(args.out_dir, exist_ok=True)
    preds = sorted(glob.glob(os.path.join(args.pred_dir, "*_label.png")))[: args.limit]
    for pred_path in preds:
        stem = os.path.basename(pred_path).replace("_label.png", "")
        panels = []
        rgb_path = _find(args.rgb_dir, stem)
        gt_path = _find(args.gt_dir, stem)
        pred = np.asarray(Image.open(pred_path))
        size = (pred.shape[1], pred.shape[0])
        if rgb_path:
            panels.append(np.asarray(Image.open(rgb_path).convert("RGB").resize(size)))
        if gt_path:
            gt = np.asarray(Image.open(gt_path).resize(size, Image.NEAREST))
            panels.append(colorize(gt, palette))
        panels.append(colorize(pred, palette))
        sheet = np.concatenate(panels, axis=1)
        Image.fromarray(sheet).save(os.path.join(args.out_dir, f"{stem}_sheet.png"))
    print(f"wrote {len(preds)} sheets to {args.out_dir}")


def _find(d, stem):
    for ext in (".png", ".jpg"):
        q = os.path.join(d, stem + ext)
        if os.path.exists(q):
            return q
    hits = glob.glob(os.path.join(d, stem + "*"))
    return hits[0] if hits else None


if __name__ == "__main__":
    main()
