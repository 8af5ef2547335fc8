"""Decoded-corpus disk cache (data/disk_cache.py, VERDICT r2 #2).

Contract under test: the training stream is BIT-identical with the cache
off, cold, warm, partially-budgeted, or served to a fresh dataset object
(a re-run); epoch >= 2 and re-runs perform ZERO image decodes for covered
indices; stale caches (changed corpus / geometry) are rebuilt, never served.
"""

import os

import numpy as np
import pytest

from mcseg_tpu.core.config import DataConfig
from mcseg_tpu.data.datasets import ZipDataset, get_dataset
from mcseg_tpu.data.disk_cache import DiskDecodeCache
from mcseg_tpu.data.pipeline import batch_iterator
from tests.test_corpus_layouts import make_nyu_like

W, H = 64, 32


def _cfg(root, cache_dir, gb=1.0, **kw):
    return DataConfig(
        src_dataset="nyu", tgt_dataset="nyu", data_root=root, batch_size=2,
        train_img_shape=(W, H), test_img_shape=(W, H), max_samples=None,
        decode_cache_gb=0.0,  # RAM cache OFF: isolate the disk layer
        decode_disk_cache_gb=gb, decode_disk_cache_dir=cache_dir, **kw)


def _epoch_batches(ds, seed=3):
    it = batch_iterator(ds, 2, shuffle=True, seed=seed, epochs=1)
    return list(it)


def _assert_batches_equal(a, b):
    assert len(a) == len(b)
    for ba, bb in zip(a, b):
        assert set(ba) == set(bb)
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k])


def _forbid_decode(monkeypatch, ds):
    def boom(*a, **k):
        raise AssertionError("decode called despite warm disk cache")

    for name in ("_decode_rgb", "_decode_label", "_decode_depth"):
        monkeypatch.setattr(type(ds), name, boom)
    from mcseg_tpu import native

    for name in ("decode_rgb_batch", "decode_gray_batch",
                 "decode_depth16_batch"):
        if hasattr(native, name):
            monkeypatch.setattr(native, name, boom)


def test_stream_bit_identical_and_rerun_decodes_nothing(tmp_path, monkeypatch):
    root = str(tmp_path / "corpus")
    make_nyu_like(root, n=5, splits=("train",))

    baseline = _epoch_batches(
        get_dataset("nyu", _cfg(root, cache_dir="", gb=0.0), "train"))

    cache_dir = str(tmp_path / "cache")
    ds_cold = get_dataset("nyu", _cfg(root, cache_dir), "train")
    assert ds_cold._disk is not None and ds_cold._disk.cached_n == 5
    cold = _epoch_batches(ds_cold)  # fills the cache while streaming
    _assert_batches_equal(cold, baseline)

    # fresh dataset object = a re-run over the same corpus: identical stream,
    # and not a single decode call (per-sample OR native batch API)
    ds_warm = get_dataset("nyu", _cfg(root, cache_dir), "train")
    _forbid_decode(monkeypatch, ds_warm)
    warm = _epoch_batches(ds_warm)
    _assert_batches_equal(warm, baseline)


def test_partial_budget_prefix_cached_tail_decoded(tmp_path):
    root = str(tmp_path / "corpus")
    make_nyu_like(root, n=6, splits=("train",))
    baseline = _epoch_batches(
        get_dataset("nyu", _cfg(root, cache_dir="", gb=0.0), "train"))

    # budget for ~2 samples: rgb+label+depth at the corpus-native decode
    # size (640x480 for nyu; decode_size is canonical, not train_img_shape)
    dw, dh = 640, 480
    per_sample = dw * dh * 8 + 1
    cache_dir = str(tmp_path / "cache")
    cfg = _cfg(root, cache_dir, gb=2.5 * per_sample / 1e9)
    ds = get_dataset("nyu", cfg, "train")
    assert ds._disk.cached_n == 2  # prefix only
    _assert_batches_equal(_epoch_batches(ds), baseline)
    # second pass (mixed disk-hit + decode batches) still identical
    ds2 = get_dataset("nyu", cfg, "train")
    _assert_batches_equal(_epoch_batches(ds2), baseline)


def test_stale_cache_rebuilt_on_geometry_change(tmp_path):
    root = str(tmp_path / "corpus")
    make_nyu_like(root, n=3, splits=("train",))
    cache_dir = str(tmp_path / "cache")
    ds = get_dataset("nyu", _cfg(root, cache_dir), "train")
    _epoch_batches(ds)
    assert ds._disk.has(0)

    # same corpus at a different decode geometry -> different cache subdir
    cfg2 = _cfg(root, cache_dir)
    ds2 = get_dataset("nyu", cfg2, "train")
    ds2.decode_size = (32, 16)
    from mcseg_tpu.data.disk_cache import open_for_dataset

    ds2._disk = open_for_dataset(ds2)
    assert ds2._disk.dir != ds._disk.dir
    s = ds2[0]
    assert s["image"].shape == (16, 32, 3)

    # corpus content change at the SAME geometry -> fingerprint mismatch
    # wipes the old rows instead of serving them
    make_nyu_like(root, n=4, splits=("train",))  # adds a 4th file
    ds3 = get_dataset("nyu", _cfg(root, cache_dir), "train")
    assert ds3._disk is not None
    assert not ds3._disk.has(0)  # rebuilt empty


def test_torn_write_reDecodes(tmp_path):
    root = str(tmp_path / "corpus")
    make_nyu_like(root, n=3, splits=("train",))
    cache_dir = str(tmp_path / "cache")
    ds = get_dataset("nyu", _cfg(root, cache_dir), "train")
    want = {k: v.copy() for k, v in ds[0].items()}
    # simulate a crash between the plane write and the filled flag
    ds._disk._filled[0] = 0
    ds2 = get_dataset("nyu", _cfg(root, cache_dir), "train")
    assert ds2._disk.get(0) is None  # not served
    got = ds2[0]  # decodes again and re-fills
    for k in want:
        np.testing.assert_array_equal(got[k], want[k])
    assert ds2._disk.has(0)


def test_zip_dataset_and_ram_cache_interplay(tmp_path):
    """Disk cache under the production stack: ZipDataset + RAM cache ON.
    Stream equality vs the no-cache stream over two epochs."""
    root = str(tmp_path / "corpus")
    make_nyu_like(root, n=4, splits=("train",))

    def two_epochs(cfg):
        src = get_dataset("nyu", cfg, "train")
        tgt = get_dataset("nyu", cfg, "train")
        it = batch_iterator(ZipDataset(src, tgt), 2, shuffle=True, seed=0,
                            epochs=2)
        return list(it)

    base = two_epochs(_cfg(root, cache_dir="", gb=0.0))
    cached = two_epochs(DataConfig(
        src_dataset="nyu", tgt_dataset="nyu", data_root=root, batch_size=2,
        train_img_shape=(W, H), test_img_shape=(W, H),
        decode_cache_gb=1.0,  # RAM cache ON too (production default)
        decode_disk_cache_gb=1.0,
        decode_disk_cache_dir=str(tmp_path / "cache")))
    assert len(base) == len(cached)
    for (bs, bt), (cs, ct) in zip(base, cached):
        for k in bs:
            np.testing.assert_array_equal(bs[k], cs[k])
        for k in bt:
            np.testing.assert_array_equal(bt[k], ct[k])


def test_inplace_file_regeneration_invalidates(tmp_path):
    """Same paths, same n, NEW bytes (e.g. boundary maps re-made with another
    --dilate): the (st_size, st_mtime_ns) fingerprint must wipe the cache
    instead of serving the stale decode (ADVICE r3 #1)."""
    import time

    from PIL import Image

    root = str(tmp_path / "corpus")
    make_nyu_like(root, n=3, splits=("train",))
    cache_dir = str(tmp_path / "cache")
    ds = get_dataset("nyu", _cfg(root, cache_dir), "train")
    _epoch_batches(ds)
    assert ds._disk.has(0)
    old0 = ds._disk.get(0)["image"].copy()

    # regenerate sample 0's RGB in place with different pixels
    p = ds.samples[0]["rgb"]
    time.sleep(0.01)  # guarantee a distinct mtime even on coarse clocks
    Image.fromarray(np.full((32, 64, 3), 200, np.uint8)).save(p)

    ds2 = get_dataset("nyu", _cfg(root, cache_dir), "train")
    assert ds2._disk is not None
    assert not ds2._disk.has(0)  # wiped, not served stale
    fresh = ds2[0]["image"]
    assert not np.array_equal(fresh, old0)
    assert (fresh == 200).mean() > 0.9


def test_budget_change_resizes_in_place(tmp_path, monkeypatch):
    """--decode_disk_cache_gb grow keeps every filled row (no re-decode);
    shrink truncates instead of wiping (ADVICE r3 #4)."""
    root = str(tmp_path / "corpus")
    make_nyu_like(root, n=6, splits=("train",))
    cache_dir = str(tmp_path / "cache")
    dw, dh = 640, 480
    per_sample = dw * dh * 8 + 1  # rgb u8*3 + label u8 + depth f32

    cfg_small = _cfg(root, cache_dir, gb=2.5 * per_sample / 1e9)
    ds = get_dataset("nyu", cfg_small, "train")
    assert ds._disk.cached_n == 2
    _epoch_batches(ds)
    assert ds._disk.has(0) and ds._disk.has(1)
    row0 = {k: v.copy() for k, v in ds._disk.get(0).items()}

    # GROW: rows 0..1 must survive; reading them decodes nothing
    ds_big = get_dataset(
        "nyu", _cfg(root, cache_dir, gb=4.5 * per_sample / 1e9), "train")
    assert ds_big._disk.cached_n == 4
    assert ds_big._disk.has(0) and ds_big._disk.has(1)
    assert not ds_big._disk.has(2)  # grown region starts empty
    _forbid_decode(monkeypatch, ds_big)
    got = ds_big[0]
    for k in row0:
        np.testing.assert_array_equal(got[k], row0[k])
    monkeypatch.undo()

    # SHRINK back: row 0 still filled, rows beyond cached_n gone
    ds_shrunk = get_dataset("nyu", cfg_small, "train")
    assert ds_shrunk._disk.cached_n == 2
    assert ds_shrunk._disk.has(0)
    for k in row0:
        np.testing.assert_array_equal(ds_shrunk._disk.get(0)[k], row0[k])


def test_decode_size_mutation_reopens_automatically(tmp_path):
    """Mutating ds.decode_size after construction (the bench.py pattern) must
    transparently re-key the disk cache to the new geometry — no manual
    re-open, no old-resolution rows (ADVICE r3 #2)."""
    root = str(tmp_path / "corpus")
    make_nyu_like(root, n=3, splits=("train",))
    cache_dir = str(tmp_path / "cache")

    ds = get_dataset("nyu", _cfg(root, cache_dir), "train")
    dir_a = ds._disk.dir
    _epoch_batches(ds)
    assert ds._disk.has(0)

    ds.decode_size = (32, 16)  # mutate AFTER the cache was touched
    assert ds._disk.dir != dir_a  # property re-opened at the new geometry
    s = ds[0]
    assert s["image"].shape == (16, 32, 3)
    batch = ds.get_batch([0, 1])
    assert batch["image"].shape == (2, 16, 32, 3)


def test_late_fusion_rejects_wrong_input_ch():
    """fusion='late' hard-splits channels [0:3]/[3:6]; any other input_ch is
    a loud error, never a silent plane drop (ADVICE r3 #3)."""
    from mcseg_tpu.core.config import ModelConfig
    from mcseg_tpu.models.factory import get_models

    with pytest.raises(ValueError, match="input_ch 6"):
        get_models(ModelConfig(net="drn_d_22", input_ch=7, n_class=5,
                               fusion="late"))
    with pytest.raises(ValueError, match="input_ch 6"):
        get_models(ModelConfig(net="drn_d_22", input_ch=4, n_class=5,
                               fusion="late"))
    g, f1, f2 = get_models(ModelConfig(net="drn_d_22", input_ch=6, n_class=5,
                                       fusion="late"))
    assert g is not None


def test_unwritable_corpus_root_disables_gracefully(tmp_path, capsys):
    root = str(tmp_path / "corpus")
    make_nyu_like(root, n=2, splits=("train",))
    # budget smaller than one sample -> ValueError path -> disabled, not fatal
    ds = get_dataset("nyu", _cfg(root, cache_dir="", gb=1e-9), "train")
    assert ds._disk is None
    assert ds[0]["image"].shape == (480, 640, 3)  # corpus-native decode size


def test_cli_flag_plumbing():
    """--decode_disk_cache_gb/_dir flow from argparse into DataConfig."""
    from mcseg_tpu.cli.argparse_compat import (
        args_to_config,
        get_da_mcd_training_parser,
    )

    p = get_da_mcd_training_parser()
    args = p.parse_args(["synthetic", "synthetic",
                         "--decode_disk_cache_gb", "12.5",
                         "--decode_disk_cache_dir", "/fast/scratch",
                         "--decode_cache_gb", "0.5"])
    cfg = args_to_config(args, adapt=True)
    assert cfg.data.decode_disk_cache_gb == 12.5
    assert cfg.data.decode_disk_cache_dir == "/fast/scratch"
    assert cfg.data.decode_cache_gb == 0.5
    # default stays off (cache creation touches the corpus root)
    cfg0 = args_to_config(p.parse_args(["synthetic", "synthetic"]), adapt=True)
    assert cfg0.data.decode_disk_cache_gb == 0.0
    assert cfg0.data.decode_cache_gb == 4.0  # RAM cache default stays on


def test_disabled_ram_tier_skips_dead_copies_but_promotion_still_works(tmp_path):
    """The round-4 steady-state fix (_cache_accepting): with the RAM tier
    disabled (decode_cache_gb=0) the disk path must not populate the RAM
    cache (it used to build per-sample copies only for _cache_put to reject
    them — 45 -> ~1250 img/s once removed), while with the tier enabled disk
    hits still PROMOTE into RAM (ram_hits on the following epoch)."""
    root = str(tmp_path / "corpus")
    make_nyu_like(root, n=4, splits=("train",))

    # RAM tier off: disk hits serve every epoch >= 2 batch, RAM stays empty
    ds = get_dataset("nyu", _cfg(root, str(tmp_path / "c1"), gb=1.0), "train")
    _epoch_batches(ds)          # epoch 1: decode + fill disk
    warm = _epoch_batches(ds)   # epoch 2: whole-batch disk path
    assert ds.io_stats["disk_hits"] == len(ds)
    assert len(ds._cache) == 0 and ds._cache_bytes == 0
    # and the stream matches a cache-free dataset exactly
    plain = get_dataset("nyu", _cfg(root, "", gb=0.0), "train")
    _assert_batches_equal(warm, _epoch_batches(plain))

    # RAM tier on: epoch 2 disk hits promote, epoch 3 rides RAM
    cfg = DataConfig(
        src_dataset="nyu", tgt_dataset="nyu", data_root=root, batch_size=2,
        train_img_shape=(W, H), test_img_shape=(W, H),
        decode_cache_gb=1.0, decode_disk_cache_gb=1.0,
        decode_disk_cache_dir=str(tmp_path / "c2"))
    ds2 = get_dataset("nyu", cfg, "train")
    _epoch_batches(ds2)   # decode + fill both tiers... (decodes populate RAM)
    ds2._cache.clear()
    ds2._cache_bytes = 0  # force epoch 2 onto the disk tier
    _epoch_batches(ds2)   # disk hits must promote into RAM
    assert len(ds2._cache) == len(ds2)
    before = ds2.io_stats["ram_hits"]
    ram = _epoch_batches(ds2)   # epoch 3: RAM tier
    assert ds2.io_stats["ram_hits"] - before == len(ds2)
    _assert_batches_equal(ram, _epoch_batches(plain))
