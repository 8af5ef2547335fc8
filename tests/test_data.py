"""Data layer: remap tables, synthetic corpus, zip pairing, host transforms,
batch iterator (SURVEY.md section 4 'unit')."""

import numpy as np
import pytest

from mcseg_tpu.core.config import DataConfig
from mcseg_tpu.data.datasets import SyntheticDataset, ZipDataset, get_dataset
from mcseg_tpu.data.labels import (
    IGNORE,
    cityscapes_id_to_train_table,
    get_label_spec,
    nyu40_raw_to_train_table,
    remap,
)
from mcseg_tpu.data.pipeline import batch_iterator
from mcseg_tpu.data.transforms import (
    colorize,
    joint_random_crop_flip,
    normalize_multichannel,
    scale_image,
    scale_label,
)


def _cfg(**kw):
    defaults = dict(
        src_dataset="synthetic", tgt_dataset="synthetic", batch_size=2,
        train_img_shape=(64, 48), test_img_shape=(64, 48), input_ch=3,
        max_samples=8,
    )
    defaults.update(kw)
    return DataConfig(**defaults)


def test_cityscapes_remap_table():
    t = cityscapes_id_to_train_table()
    assert t[7] == 0 and t[26] == 13 and t[33] == 18
    assert t[0] == IGNORE and t[34] == IGNORE and t[255] == IGNORE
    assert (t != IGNORE).sum() == 19


def test_nyu40_remap_table():
    t = nyu40_raw_to_train_table()
    assert t[0] == IGNORE
    assert t[1] == 0 and t[40] == 39
    assert t[41] == IGNORE


def test_remap_is_gather():
    t = nyu40_raw_to_train_table()
    lbl = np.array([[0, 1], [40, 200]], np.uint8)
    out = remap(lbl, t)
    np.testing.assert_array_equal(out, [[IGNORE, 0], [39, IGNORE]])


def test_label_spec_lookup():
    n, _, names, pal = get_label_spec("city")
    assert n == 19 and len(names) == 19 and pal.shape == (19, 3)
    n, _, names, _ = get_label_spec("suncg")
    assert n == 40 and len(names) == 40


def test_synthetic_dataset_deterministic_and_learnable():
    ds = SyntheticDataset(_cfg(), "train", seed=0)
    a, b = ds[3], ds[3]
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["label"], b["label"])
    assert a["image"].shape == (48, 64, 3) and a["image"].dtype == np.uint8
    assert a["depth"].shape == (48, 64) and a["depth"].dtype == np.float32
    # raw labels in 0..12 range (0=void), more than one class present
    assert a["label"].max() >= 1 and len(np.unique(a["label"])) > 2
    # different index -> different scene
    c = ds[4]
    assert not np.array_equal(a["label"], c["label"])


def test_synthetic_shifted_dataset_properties():
    """The domain-shift harness corpus (tests/test_adaptation_gain.py):
    deterministic, appearance-only shift, geometry distribution unchanged."""
    import dataclasses

    from mcseg_tpu.data.datasets import SyntheticShiftedDataset

    cfg = _cfg()
    shifted = get_dataset("synthetic_shifted", cfg, "train")
    assert isinstance(shifted, SyntheticShiftedDataset)
    a, b = shifted[3], shifted[3]
    np.testing.assert_array_equal(a["image"], b["image"])  # deterministic
    assert a["image"].dtype == np.uint8

    # same-seed twin: SyntheticDataset at the shifted corpus's seed offset
    # draws the SAME scene (labels/depth identical) — the shift moves only
    # the RGB appearance
    twin = SyntheticDataset(cfg, "train", seed=7)
    t = twin[3]
    np.testing.assert_array_equal(a["label"], t["label"])
    np.testing.assert_array_equal(a["depth"], t["depth"])
    assert np.abs(a["image"].astype(float) - t["image"].astype(float)).mean() > 10

    # shift strength 0 disables the appearance change entirely
    cfg0 = dataclasses.replace(cfg, domain_shift=0.0)
    s0 = get_dataset("synthetic_shifted", cfg0, "train")
    np.testing.assert_array_equal(s0[3]["image"], t["image"])

    # target scenes are different INSTANCES than the source's (seed offset),
    # drawn from the same distribution
    src = get_dataset("synthetic", cfg, "train")
    assert not np.array_equal(src[3]["label"], a["label"])


def test_get_dataset_factory_and_zip():
    cfg = _cfg()
    src = get_dataset("synthetic", cfg, "train")
    tgt = SyntheticDataset(cfg, "train", seed=77)
    z = ZipDataset(src, tgt)
    assert len(z) == min(len(src), len(tgt))
    (s, t) = z[0]
    assert s["image"].shape == t["image"].shape


def test_get_dataset_unknown():
    with pytest.raises(ValueError):
        get_dataset("imagenet", _cfg())


def test_joint_crop_flip_equivariance():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (40, 60, 3), np.uint8)
    label = rng.randint(0, 5, (40, 60), np.uint8)
    # mark a distinctive pixel
    img[10, 20] = [255, 0, 0]
    label[10, 20] = 4
    for seed in range(5):
        r = np.random.RandomState(seed)
        ci, cl = joint_random_crop_flip(img, label, (32, 48), r, flip=True)
        assert ci.shape == (32, 48, 3) and cl.shape == (32, 48)
        # wherever the marker survived, img and label agree on its location
        pos_i = np.argwhere((ci == [255, 0, 0]).all(-1))
        pos_l = np.argwhere(cl == 4)
        if len(pos_i) == 1 and len(pos_l) == 1:
            np.testing.assert_array_equal(pos_i[0], pos_l[0])


def test_scale_image_and_label():
    img = np.zeros((20, 30, 3), np.uint8)
    assert scale_image(img, (15, 10)).shape == (10, 15, 3)
    lbl = np.random.RandomState(0).randint(0, 4, (20, 30)).astype(np.uint8)
    out = scale_label(lbl, (15, 10))
    assert out.shape == (10, 15)
    assert set(np.unique(out)) <= set(np.unique(lbl))  # nearest never invents ids


def test_normalize_multichannel_shapes():
    for c in (1, 3, 4, 6):
        x = np.random.RandomState(0).randint(0, 255, (8, 8, c), np.uint8)
        out = normalize_multichannel(x)
        assert out.shape == (8, 8, c) and out.dtype == np.float32


def test_colorize_ignores():
    pal = np.array([[10, 0, 0], [0, 10, 0]], np.uint8)
    lbl = np.array([[0, 1], [255, 0]], np.uint8)
    rgb = colorize(lbl, pal)
    np.testing.assert_array_equal(rgb[1, 0], [0, 0, 0])
    np.testing.assert_array_equal(rgb[0, 1], [0, 10, 0])


def test_batch_iterator_shapes_and_epochs():
    cfg = _cfg(max_samples=5)
    ds = SyntheticDataset(cfg, "train")
    batches = list(batch_iterator(ds, 2, seed=0, epochs=2))
    assert len(batches) == 4  # 2 per epoch, drop_last
    assert batches[0]["image"].shape == (2, 48, 64, 3)
    assert batches[0]["label"].shape == (2, 48, 64)


def test_batch_iterator_zip():
    cfg = _cfg(max_samples=4)
    z = ZipDataset(SyntheticDataset(cfg, "train", seed=0),
                   SyntheticDataset(cfg, "train", seed=9))
    (s, t) = next(batch_iterator(z, 2, epochs=1))
    assert s["image"].shape == t["image"].shape == (2, 48, 64, 3)
    assert not np.array_equal(s["image"], t["image"])


def test_batch_iterator_pool_matches_serial():
    """num_workers>1 (thread-pool decode) yields identical batches in the
    same order as the serial path for the same seed."""
    cfg = _cfg(max_samples=6)
    ds = SyntheticDataset(cfg, "train")
    serial = list(batch_iterator(ds, 2, seed=3, epochs=2, num_workers=0))
    pooled = list(batch_iterator(ds, 2, seed=3, epochs=2, num_workers=4))
    assert len(serial) == len(pooled)
    for a, b in zip(serial, pooled):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


def test_wire_format_depth_and_label():
    from mcseg_tpu.data.pipeline import wire_format

    batch = {
        "image": np.zeros((2, 4, 4, 3), np.uint8),
        "label": np.ones((2, 4, 4), np.uint8),
        "depth": np.array([[[0.0015, 2.5]]], np.float32),
    }
    out = wire_format(batch)
    assert out["depth"].dtype == np.uint16
    np.testing.assert_array_equal(out["depth"], [[[2, 2500]]])  # mm, rounded half-up
    assert "label" in out
    out2 = wire_format(batch, drop_label=True)
    assert "label" not in out2 and out2["image"].dtype == np.uint8


def test_depth_to_meters_roundtrip():
    import jax.numpy as jnp

    from mcseg_tpu.data.pipeline import wire_format
    from mcseg_tpu.ops.preprocess import depth_to_meters

    d = np.random.RandomState(0).rand(3, 5).astype(np.float32) * 8
    wire = wire_format({"depth": d})["depth"]
    back = np.asarray(depth_to_meters(jnp.asarray(wire)))
    np.testing.assert_allclose(back, d, atol=5.1e-4)  # half-mm quantization
    # float32 passes through untouched
    np.testing.assert_array_equal(np.asarray(depth_to_meters(jnp.asarray(d))), d)


def _write_nyu_fixture(root, n=5, w=32, h=24, with_depth=True):
    import os

    from PIL import Image

    rng = np.random.RandomState(7)
    for sub in ("train_rgb", "train_label") + (("train_depth",) if with_depth else ()):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    for i in range(n):
        Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(
            os.path.join(root, "train_rgb", f"{i:03d}.png"))
        Image.fromarray(rng.randint(0, 41, (h, w)).astype(np.uint8)).save(
            os.path.join(root, "train_label", f"{i:03d}.png"))
        if with_depth:
            Image.fromarray((rng.rand(h, w) * 4000 + 500).astype(np.uint16)).save(
                os.path.join(root, "train_depth", f"{i:03d}.png"))


def test_get_batch_matches_per_sample(tmp_path):
    """The whole-batch native decode path (datasets.get_batch — one ctypes
    call per plane, no np.stack) yields exactly the per-sample path's arrays,
    in the same order."""
    from mcseg_tpu.data.datasets import NYUDv2Dataset

    _write_nyu_fixture(str(tmp_path), n=5)
    cfg = _cfg(data_root=str(tmp_path))
    ds = NYUDv2Dataset(cfg, "train")
    ds.decode_size = (32, 24)
    idx = [3, 0, 4]
    batch = ds.get_batch(idx)
    assert set(batch) == {"image", "label", "depth"}
    for k in batch:
        ref = np.stack([ds[i][k] for i in idx])
        np.testing.assert_array_equal(batch[k], ref, err_msg=k)


def test_get_batch_fallback_without_native(tmp_path, monkeypatch):
    from mcseg_tpu.data.datasets import NYUDv2Dataset

    _write_nyu_fixture(str(tmp_path), n=4)
    monkeypatch.setenv("MCSEG_NO_NATIVE", "1")
    cfg = _cfg(data_root=str(tmp_path))
    ds = NYUDv2Dataset(cfg, "train")
    ds.decode_size = (32, 24)
    batch = ds.get_batch([1, 2])
    for k in batch:
        np.testing.assert_array_equal(
            batch[k], np.stack([ds[i][k] for i in (1, 2)]), err_msg=k)


def test_batch_iterator_uses_get_batch_same_stream(tmp_path):
    """batch_iterator over a file corpus (get_batch fast path, pooled and
    serial) produces the identical stream to per-sample __getitem__ stacking."""
    from mcseg_tpu.data.datasets import NYUDv2Dataset
    from mcseg_tpu.data.pipeline import _stack_items

    _write_nyu_fixture(str(tmp_path), n=6)
    cfg = _cfg(data_root=str(tmp_path))
    ds = NYUDv2Dataset(cfg, "train")
    ds.decode_size = (32, 24)

    from mcseg_tpu.data.pipeline import _index_batches

    want = [
        _stack_items([ds[int(j)] for j in idx])
        for idx in _index_batches(len(ds), 2, True, 5, True, 1)
    ]
    for workers in (0, 3):
        got = list(batch_iterator(ds, 2, seed=5, epochs=1, num_workers=workers))
        assert len(got) == len(want)
        for a, b in zip(got, want):
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])


def test_decode_cache_hits_and_budget(tmp_path):
    """Decoded-sample RAM cache: hits return identical arrays without decode;
    the byte budget is respected; decode_cache_gb=0 disables caching."""
    import dataclasses

    from mcseg_tpu.data.datasets import NYUDv2Dataset

    _write_nyu_fixture(str(tmp_path), n=4)
    cfg = _cfg(data_root=str(tmp_path))
    ds = NYUDv2Dataset(cfg, "train")
    ds.decode_size = (32, 24)

    first = {k: v.copy() for k, v in ds[1].items()}
    assert 1 in ds._cache
    again = ds[1]
    for k in first:
        np.testing.assert_array_equal(first[k], again[k])
    # get_batch over fully-cached indices equals a fresh native decode
    fresh = NYUDv2Dataset(cfg, "train")
    fresh.decode_size = (32, 24)
    _ = ds.get_batch([0, 1, 2, 3])  # populates the rest
    cached_batch = ds.get_batch([2, 0])
    fresh_batch = fresh.get_batch([2, 0])
    for k in fresh_batch:
        np.testing.assert_array_equal(cached_batch[k], fresh_batch[k])
    assert ds._cache_bytes <= ds._cache_budget

    off = NYUDv2Dataset(dataclasses.replace(cfg, decode_cache_gb=0.0), "train")
    off.decode_size = (32, 24)
    off[0]
    off.get_batch([1, 2])
    assert off._cache == {} and off._cache_bytes == 0

    tiny_budget = sum(v.nbytes for v in first.values()) + 1
    part = NYUDv2Dataset(cfg, "train")
    part.decode_size = (32, 24)
    part._cache_budget = tiny_budget
    part[0]
    part[1]  # over budget: not cached
    assert 0 in part._cache and 1 not in part._cache
    assert part._cache_bytes <= tiny_budget


def test_get_batch_partial_cache_decodes_only_missing(tmp_path):
    """A batch mixing cached and uncached samples must assemble correctly AND
    only decode the missing subset (an all-or-nothing cache check re-decoded
    whole batches forever when epoch length didn't divide the corpus)."""
    from mcseg_tpu import native
    from mcseg_tpu.data.datasets import NYUDv2Dataset

    _write_nyu_fixture(str(tmp_path), n=6)
    cfg = _cfg(data_root=str(tmp_path))
    ds = NYUDv2Dataset(cfg, "train")
    ds.decode_size = (32, 24)
    _ = ds.get_batch([1, 4])  # warm two samples
    assert set(ds._cache) == {1, 4}

    calls = []
    orig = native.decode_rgb_batch

    def spy(paths, h, w):
        calls.append(list(paths))
        return orig(paths, h, w)

    native.decode_rgb_batch, _saved = spy, orig
    try:
        batch = ds.get_batch([4, 2, 1, 5])  # 2 cached + 2 missing
    finally:
        native.decode_rgb_batch = _saved
    fresh = NYUDv2Dataset(cfg, "train")
    fresh.decode_size = (32, 24)
    want = fresh.get_batch([4, 2, 1, 5])
    for k in want:
        np.testing.assert_array_equal(batch[k], want[k], err_msg=k)
    if native.available():  # native path: only the 2 missing were decoded
        assert len(calls) == 1 and len(calls[0]) == 2
        assert set(ds._cache) == {1, 2, 4, 5}
