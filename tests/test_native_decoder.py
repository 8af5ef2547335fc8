"""Native C++ decoder vs PIL oracle (exactness at native size, robustness)."""

import numpy as np
import pytest
from PIL import Image

from mcseg_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native decoder unavailable (no toolchain)"
)


@pytest.fixture(scope="module")
def img_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    rgb = rng.randint(0, 255, (48, 64, 3), np.uint8)
    Image.fromarray(rgb).save(d / "rgb.png")
    Image.fromarray(rgb).save(d / "rgb.jpg", quality=95)
    lbl = rng.randint(0, 40, (48, 64)).astype(np.uint8)
    Image.fromarray(lbl).save(d / "label.png")
    depth = (rng.rand(48, 64) * 4000).astype(np.uint16)
    Image.fromarray(depth).save(d / "depth16.png")
    # Paletted label PNG — the official GTA5 label format: class id is the
    # palette INDEX; palette colors are the Cityscapes RGB scheme.
    pal_img = Image.fromarray(lbl, mode="P")
    palette = np.zeros((256, 3), np.uint8)
    palette[: 40] = rng.randint(0, 255, (40, 3))
    palette[7] = (128, 64, 128)  # road color — trips RGB-expanding decoders
    pal_img.putpalette(palette.flatten().tolist())
    pal_img.save(d / "label_paletted.png")
    np.save(d / "rgb.npy", rgb)
    np.save(d / "label.npy", lbl)
    np.save(d / "depth16.npy", depth)
    return d


def test_png_rgb_exact(img_dir):
    want = np.load(img_dir / "rgb.npy")
    got = native.decode_rgb(str(img_dir / "rgb.png"), 48, 64)
    np.testing.assert_array_equal(got, want)


def test_jpeg_rgb_close(img_dir):
    want = np.asarray(Image.open(img_dir / "rgb.jpg").convert("RGB"))
    got = native.decode_rgb(str(img_dir / "rgb.jpg"), 48, 64)
    # decoders may differ by a few ULP of IDCT rounding
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 2


def test_label_exact_and_resize_preserves_ids(img_dir):
    want = np.load(img_dir / "label.npy")
    got = native.decode_gray(str(img_dir / "label.png"), 48, 64)
    np.testing.assert_array_equal(got, want)
    small = native.decode_gray(str(img_dir / "label.png"), 24, 32)
    assert set(np.unique(small)) <= set(np.unique(want))  # nearest: no new ids


def test_paletted_label_decodes_to_indices(img_dir):
    """GTA5-style paletted label PNG: native and PIL must both return the
    palette index (the class id), never the palette color's red channel."""
    want = np.load(img_dir / "label.npy")
    pil = np.asarray(Image.open(img_dir / "label_paletted.png"), np.uint8)
    np.testing.assert_array_equal(pil, want)  # PIL 'P' mode yields indices
    got = native.decode_gray(str(img_dir / "label_paletted.png"), 48, 64)
    np.testing.assert_array_equal(got, want)


def test_depth8_matches_pil_path(img_dir, tmp_path):
    """8-bit integer depth: both decode paths use the same mm->m convention."""
    from mcseg_tpu.core.config import DataConfig
    from mcseg_tpu.data.datasets import NYUDv2Dataset

    rng = np.random.RandomState(3)
    d8 = rng.randint(0, 255, (480, 640), np.uint8)
    root = tmp_path / "d8"
    for sub in ("train_rgb", "train_label", "train_depth"):
        (root / sub).mkdir(parents=True)
    Image.fromarray(np.zeros((480, 640, 3), np.uint8)).save(root / "train_rgb" / "a.png")
    Image.fromarray(np.zeros((480, 640), np.uint8)).save(root / "train_label" / "a.png")
    Image.fromarray(d8).save(root / "train_depth" / "a.png")

    ds = NYUDv2Dataset(DataConfig(data_root=str(root)), "train")
    native_depth = ds[0]["depth"]
    import os

    os.environ["MCSEG_NO_NATIVE"] = "1"
    try:
        pil_depth = ds[0]["depth"]
    finally:
        del os.environ["MCSEG_NO_NATIVE"]
    np.testing.assert_allclose(native_depth, d8.astype(np.float32) * 0.001, atol=1e-6)
    np.testing.assert_allclose(pil_depth, native_depth, atol=1e-6)


def test_depth16_mm_to_meters(img_dir):
    want = np.load(img_dir / "depth16.npy").astype(np.float32) / 1000.0
    got = native.decode_depth16(str(img_dir / "depth16.png"), 48, 64)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_rgb_resize_runs(img_dir):
    got = native.decode_rgb(str(img_dir / "rgb.png"), 96, 128)
    assert got.shape == (96, 128, 3)


def test_batch_decode(img_dir):
    paths = [str(img_dir / "rgb.png")] * 5
    out = native.decode_rgb_batch(paths, 48, 64, n_threads=2)
    want = np.load(img_dir / "rgb.npy")
    for i in range(5):
        np.testing.assert_array_equal(out[i], want)


def test_missing_file_raises(img_dir):
    with pytest.raises(IOError):
        native.decode_rgb(str(img_dir / "nope.png"), 8, 8)


def test_dataset_uses_native_transparently(img_dir, tmp_path):
    """SegDataset decode goes through the native path and agrees with PIL."""
    import os

    root = tmp_path / "data"
    os.makedirs(root / "train_rgb")
    os.makedirs(root / "train_label")
    rng = np.random.RandomState(1)
    rgb = rng.randint(0, 255, (480, 640, 3), np.uint8)
    lbl = rng.randint(0, 41, (480, 640)).astype(np.uint8)
    Image.fromarray(rgb).save(root / "train_rgb" / "a.png")
    Image.fromarray(lbl).save(root / "train_label" / "a.png")

    from mcseg_tpu.core.config import DataConfig
    from mcseg_tpu.data.datasets import NYUDv2Dataset

    ds = NYUDv2Dataset(DataConfig(data_root=str(root)), "train")
    sample = ds[0]
    np.testing.assert_array_equal(sample["image"], rgb)
    np.testing.assert_array_equal(sample["label"], lbl)
