"""Fused on-device preprocessing: shapes, determinism, joint img/label
geometry, normalize parity with the host (reference-semantics) path."""

import jax
import jax.numpy as jnp
import numpy as np

from mcseg_tpu.core.config import DataConfig
from mcseg_tpu.data.labels import IGNORE, nyu40_raw_to_train_table
from mcseg_tpu.data.transforms import normalize_multichannel
from mcseg_tpu.ops.preprocess import make_eval_preprocess, make_train_preprocess


def _cfg(**kw):
    d = dict(
        src_dataset="synthetic", tgt_dataset="synthetic", batch_size=2,
        train_img_shape=(64, 48), test_img_shape=(64, 48), input_ch=3,
        random_crop=True, random_flip=True,
    )
    d.update(kw)
    return DataConfig(**d)


def _raw_batch(b=2, h=60, w=80, with_depth=False, seed=0):
    rng = np.random.RandomState(seed)
    batch = {
        "image": rng.randint(0, 255, (b, h, w, 3), np.uint8),
        "label": rng.randint(0, 41, (b, h, w)).astype(np.uint8),
    }
    if with_depth:
        batch["depth"] = (rng.rand(b, h, w).astype(np.float32) * 3.0 + 0.5)
    return batch


def test_train_preprocess_shapes_rgb():
    pp = make_train_preprocess(_cfg())
    img, label = jax.jit(pp)(_raw_batch(), jax.random.key(0))
    assert img.shape == (2, 48, 64, 3) and img.dtype == jnp.float32
    assert label.shape == (2, 48, 64) and label.dtype == jnp.int32


def test_train_preprocess_rgbhha_from_depth():
    pp = make_train_preprocess(_cfg(input_ch=6))
    img, label = jax.jit(pp)(_raw_batch(with_depth=True), jax.random.key(0))
    assert img.shape == (2, 48, 64, 6)
    assert np.isfinite(np.asarray(img)).all()


def test_train_preprocess_rgbd_4ch_and_depth_only():
    pp4 = make_train_preprocess(_cfg(input_ch=4))
    img, _ = jax.jit(pp4)(_raw_batch(with_depth=True), jax.random.key(0))
    assert img.shape == (2, 48, 64, 4)
    pp1 = make_train_preprocess(_cfg(input_ch=1))
    img, _ = jax.jit(pp1)(_raw_batch(with_depth=True), jax.random.key(0))
    assert img.shape == (2, 48, 64, 1)


def test_train_preprocess_precomputed_hha_like_reference():
    batch = _raw_batch()
    batch["hha"] = np.random.RandomState(1).randint(0, 255, (2, 60, 80, 3), np.uint8)
    pp = make_train_preprocess(_cfg(input_ch=6))
    img, _ = jax.jit(pp)(batch, jax.random.key(0))
    assert img.shape == (2, 48, 64, 6)


def test_preprocess_deterministic_given_key():
    pp = make_train_preprocess(_cfg())
    b = _raw_batch()
    i1, l1 = pp(b, jax.random.key(7))
    i2, l2 = pp(b, jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    i3, _ = pp(b, jax.random.key(8))
    assert not np.array_equal(np.asarray(i1), np.asarray(i3))


def test_label_remap_applied():
    b = _raw_batch()
    b["label"][:] = 0  # raw void
    pp = make_train_preprocess(_cfg())
    _, label = pp(b, jax.random.key(0))
    assert (np.asarray(label) == IGNORE).all()
    b["label"][:] = 40
    _, label = pp(b, jax.random.key(0))
    assert (np.asarray(label) == 39).all()


def test_joint_geometry_img_label_aligned():
    """Paint one distinctive block; after random crop+flip the block must land
    at the same place in image and label."""
    b = _raw_batch(b=4, h=60, w=80)
    b["image"][:] = 0
    b["label"][:] = 1
    b["image"][:, 20:30, 30:40] = 255
    b["label"][:, 20:30, 30:40] = 40
    cfg = _cfg(crop_scale_min=0.9)
    pp = make_train_preprocess(cfg)
    img, label = pp(b, jax.random.key(3))
    img, label = np.asarray(img), np.asarray(label)
    bright = img[..., 0] > img[..., 0].mean() + img[..., 0].std()
    cls = label == 39
    for i in range(4):
        overlap = (bright[i] & cls[i]).sum()
        union = (bright[i] | cls[i]).sum()
        assert union > 0 and overlap / union > 0.8, (i, overlap, union)


def test_no_aug_path_matches_host_normalize():
    """random_crop=False, random_flip=False, equal sizes -> the device result
    equals the host transforms.normalize_multichannel oracle."""
    cfg = _cfg(random_crop=False, random_flip=False, train_img_shape=(80, 60))
    pp = make_train_preprocess(cfg)
    b = _raw_batch(b=1)
    img, label = pp(b, jax.random.key(0))
    expected = normalize_multichannel(b["image"][0])
    np.testing.assert_allclose(np.asarray(img[0]), expected, atol=1e-5)
    table = nyu40_raw_to_train_table()
    np.testing.assert_array_equal(np.asarray(label[0]), table[b["label"][0]])


def test_eval_preprocess_keeps_native_labels():
    cfg = _cfg(test_img_shape=(32, 24))
    pp = make_eval_preprocess(cfg)
    b = _raw_batch(b=1, h=60, w=80)
    img, label = jax.jit(pp)(b)
    assert img.shape == (1, 24, 32, 3)
    assert label.shape == (1, 60, 80)  # native resolution preserved


def test_resize_crop_matmul_matches_resize_then_slice():
    """The fused MXU resize+crop reproduces jax.image.resize -> dynamic-slice
    exactly (bilinear within fp tolerance; nearest bit-exact on labels)."""
    from functools import partial

    from mcseg_tpu.ops.preprocess import _crop_one, _resize_crop_matmul

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 30, 40, 3).astype(np.float32))
    pre, target = (33, 44), (24, 32)
    tops = jnp.asarray([0, 7])
    lefts = jnp.asarray([5, 12])

    ref = jax.image.resize(x, (2, *pre, 3), method="bilinear")
    ref = jax.vmap(partial(_crop_one, ch=target[0], cw=target[1]))(ref, tops, lefts)
    got = _resize_crop_matmul(x, pre, target, tops, lefts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    lbl = jnp.asarray(rng.randint(0, 41, (2, 30, 40)).astype(np.int32))
    ref_l = jax.image.resize(lbl, (2, *pre), method="nearest")
    ref_l = jax.vmap(partial(_crop_one, ch=target[0], cw=target[1]))(
        ref_l[..., None], tops, lefts
    )[..., 0]
    got_l = _resize_crop_matmul(
        lbl[..., None].astype(jnp.float32), pre, target, tops, lefts,
        nearest=True,
    )[..., 0].astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(got_l), np.asarray(ref_l))


def test_joint_geometry_aligned_on_matmul_path():
    """Same alignment property through the fused-matmul geometry (pre-crop
    canvas upscales the raw size, so the MXU path is taken)."""
    b = _raw_batch(b=4, h=60, w=80)
    b["image"][:] = 0
    b["label"][:] = 1
    b["image"][:, 20:30, 30:40] = 255
    b["label"][:, 20:30, 30:40] = 40
    cfg = _cfg(crop_scale_min=0.7, train_img_shape=(80, 60))
    pp = make_train_preprocess(cfg)
    img, label = jax.jit(pp)(b, jax.random.key(5))
    img, label = np.asarray(img), np.asarray(label)
    assert img.shape == (4, 60, 80, 3)
    bright = img[..., 0] > img[..., 0].mean() + img[..., 0].std()
    cls = label == 39
    for i in range(4):
        overlap = (bright[i] & cls[i]).sum()
        union = (bright[i] | cls[i]).sum()
        assert union > 0 and overlap / union > 0.8, (i, overlap, union)
