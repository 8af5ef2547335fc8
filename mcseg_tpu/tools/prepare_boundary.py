"""Offline label->boundary edge-map extraction tool.

Companion of the boundary-as-input-channel plane (SURVEY.md section 2
datasets row '+boundary [?]', docs/DATA.md): derives uint8 edge maps from a
directory of label PNGs with the SAME 4-neighbor class-change rule the
on-device aux-head targets use (losses/seg.py:boundary_targets_from_labels),
so the offline plane and the on-device derivation agree by construction.
Writes 0/255 PNGs into ``<split>_boundary/``-style directories that
datasets.py picks up for ``--input_ch 7`` / ``--input_ch 4``.

    python -m mcseg_tpu.tools.prepare_boundary <label_dir> <out_dir> \
        [--ignore_index 255] [--dilate N]

``--dilate N`` optionally thickens edges by N 4-neighbor dilation rounds
(some boundary-channel recipes feed wider bands than 1-px edges).
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np
from PIL import Image


def labels_to_boundary(label: np.ndarray, ignore_index: int = 255,
                       dilate: int = 0) -> np.ndarray:
    """uint8 label map [H, W] -> uint8 {0, 255} edge map [H, W].

    A pixel is a boundary pixel iff any 4-neighbor carries a *different,
    valid* class (both sides of each class edge marked; edges against
    ignore regions are not boundaries) — numerically identical to
    losses/seg.py:boundary_targets_from_labels (tested)."""
    lbl = label.astype(np.int32)
    valid = label != ignore_index
    boundary = np.zeros(label.shape, bool)
    edge_v = (lbl[1:, :] != lbl[:-1, :]) & valid[1:, :] & valid[:-1, :]
    boundary[1:, :] |= edge_v
    boundary[:-1, :] |= edge_v
    edge_h = (lbl[:, 1:] != lbl[:, :-1]) & valid[:, 1:] & valid[:, :-1]
    boundary[:, 1:] |= edge_h
    boundary[:, :-1] |= edge_h
    for _ in range(dilate):
        grown = boundary.copy()
        grown[1:, :] |= boundary[:-1, :]
        grown[:-1, :] |= boundary[1:, :]
        grown[:, 1:] |= boundary[:, :-1]
        grown[:, :-1] |= boundary[:, 1:]
        boundary = grown
    return boundary.astype(np.uint8) * 255


def main(argv=None):
    p = argparse.ArgumentParser("prepare_boundary")
    p.add_argument("label_dir")
    p.add_argument("out_dir")
    p.add_argument("--ignore_index", type=int, default=255)
    p.add_argument("--dilate", type=int, default=0,
                   help="thicken edges by N 4-neighbor dilation rounds")
    args = p.parse_args(argv)

    paths = sorted(glob.glob(os.path.join(args.label_dir, "*")))
    if not paths:
        raise SystemExit(f"no label files under {args.label_dir!r}")
    os.makedirs(args.out_dir, exist_ok=True)
    n = 0
    for path in paths:
        lbl = np.asarray(Image.open(path))
        if lbl.ndim != 2:
            raise SystemExit(
                f"{path}: expected a single-channel label PNG, got shape "
                f"{lbl.shape}")
        out = labels_to_boundary(lbl, args.ignore_index, args.dilate)
        stem = os.path.splitext(os.path.basename(path))[0]
        Image.fromarray(out).save(os.path.join(args.out_dir, stem + ".png"))
        n += 1
    print(f"wrote {n} boundary maps to {args.out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
