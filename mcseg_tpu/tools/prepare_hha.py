"""Offline depth->HHA conversion tool.

Counterpart of the reference's dataset-prep tooling (SURVEY.md section 2:
depth->HHA via the Gupta et al. recipe, delegated to external MATLAB code).
Here the SAME on-device encoder (ops/hha.py) runs in batch over a directory
of 16-bit depth PNGs (millimeters) and writes uint8 HHA PNGs — so the offline
and on-device paths are numerically identical by construction.

    python -m mcseg_tpu.tools.prepare_hha <depth_dir> <out_dir> [--fx ... ]
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np
from PIL import Image


def main(argv=None):
    p = argparse.ArgumentParser("prepare_hha")
    p.add_argument("depth_dir")
    p.add_argument("out_dir")
    p.add_argument("--fx", type=float, default=None)
    p.add_argument("--fy", type=float, default=None)
    p.add_argument("--cx", type=float, default=None)
    p.add_argument("--cy", type=float, default=None)
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from mcseg_tpu.ops.hha import (
        CameraIntrinsics,
        default_intrinsics,
        depth_to_hha_batch,
    )

    paths = sorted(
        glob.glob(os.path.join(args.depth_dir, "*.png"))
        + glob.glob(os.path.join(args.depth_dir, "*.tif"))
    )
    if not paths:
        raise FileNotFoundError(f"no depth images in {args.depth_dir}")
    os.makedirs(args.out_dir, exist_ok=True)

    def load(path):
        arr = np.asarray(Image.open(path)).astype(np.float32)
        if arr.max() > 256:  # 16-bit mm
            arr = arr / 1000.0
        return arr

    first = load(paths[0])
    h, w = first.shape
    if args.fx:
        K = CameraIntrinsics(args.fx, args.fy or args.fx,
                             args.cx or w / 2, args.cy or h / 2)
    else:
        K = default_intrinsics(h, w)

    for i in range(0, len(paths), args.batch):
        chunk = paths[i : i + args.batch]
        depths = np.stack([load(q) for q in chunk])
        hha = np.asarray(depth_to_hha_batch(jnp.asarray(depths), K))
        for q, img in zip(chunk, hha):
            out = os.path.join(
                args.out_dir, os.path.splitext(os.path.basename(q))[0] + ".png"
            )
            Image.fromarray(img.astype(np.uint8)).save(out)
        print(f"{min(i + args.batch, len(paths))}/{len(paths)}", flush=True)


if __name__ == "__main__":
    main()
