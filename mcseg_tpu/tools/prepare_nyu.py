"""Convert the official NYU Depth v2 distribution into this framework's
directory convention (docs/DATA.md; reference: SURVEY.md section 2
"Dataset-prep tooling" — the reference documents this step but ships no code).

Inputs (the three standard files):
  nyu_depth_v2_labeled.mat   MATLAB v7.3/HDF5: 'images' [N,3,W,H] uint8,
                             'depths' [N,W,H] float meters, 'labels' [N,W,H]
                             (894-class instance labels, unused here)
  labels40.mat               SUN-RGBD toolbox 40-class mapping of the 1449
                             frames: 'labels40' [H,W,N] (MATLAB v5)
  splits.mat                 official train/test split: 'trainNdxs',
                             'testNdxs' (1-based indices, MATLAB v5)

Output under --out:
  train_rgb/0001.png    train_label/0001.png    train_depth/0001.png (16-bit mm)
  val_rgb/...           val_label/...           val_depth/...

    python -m mcseg_tpu.tools.prepare_nyu nyu_depth_v2_labeled.mat \
        --labels40 labels40.mat --splits splits.mat --out /data/nyu
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _save_png(path: str, arr: np.ndarray) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def _load_splits(path: str, n: int):
    import scipy.io

    m = scipy.io.loadmat(path)
    train = m["trainNdxs"].ravel().astype(int) - 1  # 1-based -> 0-based
    test = m["testNdxs"].ravel().astype(int) - 1
    assert train.max() < n and test.max() < n
    return train, test


def _load_labels40(path: str):
    """labels40.mat is usually MATLAB v5 (scipy); fall back to HDF5."""
    try:
        import scipy.io

        m = scipy.io.loadmat(path)
        lbl = m["labels40"]  # [H, W, N]
        return np.transpose(lbl, (2, 0, 1)).astype(np.uint8)  # [N, H, W]
    except NotImplementedError:  # v7.3 file
        import h5py

        with h5py.File(path, "r") as f:
            lbl = np.asarray(f["labels40"])  # [N, W, H]
        return np.transpose(lbl, (0, 2, 1)).astype(np.uint8)


def convert(labeled_mat: str, labels40_mat: str, splits_mat: str, out: str,
            depth_scale_mm: float = 1000.0, limit: int | None = None) -> int:
    import h5py

    with h5py.File(labeled_mat, "r") as f:
        images = f["images"]  # [N, 3, W, H] uint8
        depths = f["depths"]  # [N, W, H] float meters
        n = images.shape[0]
        labels40 = _load_labels40(labels40_mat)
        assert labels40.shape[0] == n, (labels40.shape, n)
        train_idx, test_idx = _load_splits(splits_mat, n)

        written = 0
        for split, idxs in (("train", train_idx), ("val", test_idx)):
            for j, i in enumerate(idxs):
                if limit is not None and j >= limit:
                    break
                rgb = np.transpose(np.asarray(images[i]), (2, 1, 0))  # H,W,3
                depth_m = np.asarray(depths[i]).T  # H,W meters
                depth_mm = np.clip(depth_m * depth_scale_mm, 0, 65535)
                stem = f"{int(i) + 1:04d}.png"
                _save_png(os.path.join(out, f"{split}_rgb", stem),
                          rgb.astype(np.uint8))
                _save_png(os.path.join(out, f"{split}_label", stem),
                          labels40[i])
                _save_png(os.path.join(out, f"{split}_depth", stem),
                          depth_mm.astype(np.uint16))
                written += 1
    return written


def main(argv=None):
    p = argparse.ArgumentParser("prepare_nyu")
    p.add_argument("labeled_mat", help="nyu_depth_v2_labeled.mat (HDF5)")
    p.add_argument("--labels40", required=True, help="labels40.mat")
    p.add_argument("--splits", required=True, help="splits.mat")
    p.add_argument("--out", required=True)
    p.add_argument("--limit", type=int, default=None,
                   help="cap per-split frame count (smoke runs)")
    args = p.parse_args(argv)
    n = convert(args.labeled_mat, args.labels40, args.splits, args.out,
                limit=args.limit)
    print(f"wrote {n} frames under {args.out}")


if __name__ == "__main__":
    main()
