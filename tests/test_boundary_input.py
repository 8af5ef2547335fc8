"""Boundary-as-INPUT-channel (SURVEY.md section 2 datasets row '+boundary
[?]', second reading — the auxiliary boundary-detection HEAD is covered by
tests/test_multitask.py): a precomputed edge-map plane loaded from
<split>_boundary/ and stacked as input_ch=7 (rgb+hha+boundary) or input_ch=4
(rgb+boundary). Built flag-gated since the reference reading is unverifiable
(empty mount every round, docs/DIVERGENCES.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcseg_tpu.core.config import DataConfig, ModelConfig
from mcseg_tpu.data.datasets import get_dataset
from mcseg_tpu.ops.preprocess import make_eval_preprocess, make_train_preprocess
from tests.test_corpus_layouts import make_nyu_like


def _cfg(root, **kw):
    kw.setdefault("batch_size", 2)
    kw.setdefault("train_img_shape", (64, 32))
    kw.setdefault("test_img_shape", (64, 32))
    kw.setdefault("src_dataset", "nyu")
    kw.setdefault("tgt_dataset", "nyu")
    kw.setdefault("random_crop", False)
    kw.setdefault("random_flip", False)
    return DataConfig(data_root=str(root), **kw)


def _batch(b=2, h=32, w=64, with_depth=True, with_boundary=True, seed=0):
    rng = np.random.RandomState(seed)
    out = {
        "image": rng.randint(0, 255, (b, h, w, 3)).astype(np.uint8),
        "label": rng.randint(0, 40, (b, h, w)).astype(np.uint8),
    }
    if with_depth:
        out["depth"] = (rng.rand(b, h, w) * 4 + 0.5).astype(np.float32)
    if with_boundary:
        out["boundary"] = (rng.rand(b, h, w) < 0.1).astype(np.uint8) * 255
    return out


def test_boundary_plane_loads(tmp_path):
    make_nyu_like(tmp_path, with_depth=True, with_boundary=True)
    ds = get_dataset("nyu", _cfg(tmp_path), "train")
    s = ds[0]
    assert s["boundary"].shape == (480, 640)  # canonical decode size
    assert s["boundary"].dtype == np.uint8
    # NEAREST resize keeps the edge map binary
    assert set(np.unique(s["boundary"])) <= {0, 255}
    # batch fast path carries the plane too (native decode_gray_batch or
    # the per-sample fallback — either way the plane must survive)
    bat = ds.get_batch([0, 1])
    assert bat["boundary"].shape == (2, 480, 640)
    np.testing.assert_array_equal(bat["boundary"][0], s["boundary"])


def test_train_preprocess_input_ch7():
    cfg7 = _cfg("/nonexistent", input_ch=7)
    cfg6 = _cfg("/nonexistent", input_ch=6)
    batch = _batch()
    key = jax.random.key(0)
    img7, lbl7 = make_train_preprocess(cfg7)(batch, key)
    img6, lbl6 = make_train_preprocess(cfg6)(batch, key)
    assert img7.shape == (2, 32, 64, 7)
    assert np.isfinite(np.asarray(img7)).all()
    # rgb+hha channels are EXACTLY the input_ch=6 stack (same geometry key)
    np.testing.assert_array_equal(np.asarray(img7[..., :6]), np.asarray(img6))
    np.testing.assert_array_equal(np.asarray(lbl7), np.asarray(lbl6))
    # boundary channel: binarized {0,1} then (b-0.5)/0.25 -> {-2, +2}
    bnd = np.asarray(img7[..., 6])
    expect = (batch["boundary"] > 0).astype(np.float32)
    np.testing.assert_allclose(bnd, (expect - 0.5) / 0.25, atol=1e-6)


def test_train_preprocess_input_ch4_boundary_fallback():
    """With no depth/hha/ir plane, input_ch=4 consumes the boundary map."""
    cfg = _cfg("/nonexistent", input_ch=4)
    batch = _batch(with_depth=False)
    img, _ = make_train_preprocess(cfg)(batch, jax.random.key(0))
    assert img.shape == (2, 32, 64, 4)
    expect = (batch["boundary"] > 0).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(img[..., 3]), (expect - 0.5) / 0.25, atol=1e-6)


def test_train_preprocess_input_ch7_missing_boundary_raises():
    cfg = _cfg("/nonexistent", input_ch=7)
    batch = _batch(with_boundary=False)
    with pytest.raises(ValueError, match="boundary"):
        make_train_preprocess(cfg)(batch, jax.random.key(0))


def test_eval_preprocess_input_ch7():
    cfg = _cfg("/nonexistent", input_ch=7)
    img, lbl = make_eval_preprocess(cfg)(_batch())
    assert img.shape == (2, 32, 64, 7)
    assert np.isfinite(np.asarray(img)).all()


def test_boundary_survives_geometry():
    """Random crop+flip applies the SAME geometry to the boundary channel as
    to RGB (shared-seed contract): a boundary plane equal to a threshold of
    the red channel stays aligned after augmentation."""
    cfg = _cfg("/nonexistent", input_ch=4, random_crop=True, random_flip=True)
    rng = np.random.RandomState(3)
    img_u8 = rng.randint(0, 255, (2, 32, 64, 3)).astype(np.uint8)
    batch = {
        "image": img_u8,
        "label": rng.randint(0, 40, (2, 32, 64)).astype(np.uint8),
        "boundary": (img_u8[..., 0] > 127).astype(np.uint8) * 255,
    }
    img, _ = make_train_preprocess(cfg)(batch, jax.random.key(5))
    red = np.asarray(img[..., 0])
    bnd = np.asarray(img[..., 3])
    # de-normalize both planes back to [0,1]-ish and compare geometry via
    # correlation: identical resize/crop/flip => strongly correlated fields
    from mcseg_tpu.data.transforms import RGB_MEAN, RGB_STD

    red01 = red * RGB_STD[0] + RGB_MEAN[0]
    bnd01 = bnd * 0.25 + 0.5
    corr = np.corrcoef(red01.ravel(), bnd01.ravel())[0, 1]
    assert corr > 0.8, f"boundary/rgb geometry diverged (corr={corr:.3f})"


def test_model_forward_input_ch7():
    from mcseg_tpu.models.factory import get_models, widen_first_conv_params

    g, f1, _ = get_models(ModelConfig(net="drn_d_22", input_ch=7, n_class=8,
                                      dtype="float32"))
    x = jnp.zeros((1, 32, 32, 7), jnp.float32)
    var = g.init(jax.random.key(0), x, train=False)
    feat = g.apply(var, x, train=False)
    assert np.isfinite(np.asarray(feat)).all()
    # first-conv widening: RGB slice of a pretrained kernel is preserved
    k3 = jnp.asarray(np.random.RandomState(0).randn(3, 3, 3, 16), jnp.float32)
    k7 = widen_first_conv_params(k3, 7)
    assert k7.shape == (3, 3, 7, 16)
    np.testing.assert_array_equal(np.asarray(k7[:, :, :3]), np.asarray(k3))


def test_cli_accepts_input_ch7():
    from mcseg_tpu.cli.argparse_compat import (
        args_to_config, get_da_mcd_training_parser)

    p = get_da_mcd_training_parser()
    cfg = args_to_config(
        p.parse_args(["suncg", "nyu", "--input_ch", "7"]), adapt=True)
    assert cfg.model.input_ch == 7 and cfg.data.input_ch == 7


def test_prepare_boundary_matches_on_device_targets(tmp_path):
    """The offline tool's edge rule is numerically identical to the aux-head
    target derivation (losses/seg.py:boundary_targets_from_labels)."""
    from PIL import Image

    from mcseg_tpu.losses.seg import boundary_targets_from_labels
    from mcseg_tpu.tools.prepare_boundary import labels_to_boundary, main

    rng = np.random.RandomState(11)
    lbl = rng.randint(0, 6, (24, 32)).astype(np.uint8)
    lbl[3, :5] = 255  # ignore region: edges against it are NOT boundaries
    offline = labels_to_boundary(lbl)
    tgt, _ = boundary_targets_from_labels(jnp.asarray(lbl)[None])
    np.testing.assert_array_equal(offline > 0, np.asarray(tgt[0]) > 0.5)

    # CLI round-trip: labels dir -> boundary dir the datasets layer loads
    lbl_dir = tmp_path / "train_label"
    lbl_dir.mkdir()
    Image.fromarray(lbl).save(lbl_dir / "00000.png")
    out_dir = tmp_path / "train_boundary"
    assert main([str(lbl_dir), str(out_dir)]) == 0
    back = np.asarray(Image.open(out_dir / "00000.png"))
    np.testing.assert_array_equal(back, offline)
    # --dilate thickens: strictly more edge pixels on a non-trivial map
    thick = labels_to_boundary(lbl, dilate=1)
    assert (thick > 0).sum() > (offline > 0).sum()
