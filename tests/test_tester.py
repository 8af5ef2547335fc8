"""Evaluator behavior: tail samples are NOT dropped (padded with ignore), the
hist covers every image exactly once, prob dumps work."""

import glob

import jax
import numpy as np

from mcseg_tpu.core.config import DataConfig, ExperimentConfig, ModelConfig, TrainConfig
from mcseg_tpu.data.datasets import SyntheticDataset
from mcseg_tpu.eval.tester import evaluate
from mcseg_tpu.train.state import create_train_state


def _setup(n_samples, bs):
    cfg = ExperimentConfig(
        model=ModelConfig(net="drn_d_22", input_ch=3, n_class=40, dtype="float32"),
        data=DataConfig(src_dataset="synthetic", tgt_dataset="synthetic",
                        batch_size=bs, train_img_shape=(32, 32),
                        test_img_shape=(32, 32), input_ch=3,
                        max_samples=n_samples),
        train=TrainConfig(),
    )
    state, _, _ = create_train_state(cfg.model, cfg.train, jax.random.key(0),
                                     img_shape=(32, 32))
    ds = SyntheticDataset(cfg.data, "val")
    return cfg, state, ds


def test_all_samples_counted_with_ragged_tail(tmp_path):
    cfg, state, ds = _setup(n_samples=5, bs=2)  # 5 = 2+2+1 (ragged)
    miou, hist, _ = evaluate(state, cfg, ds, print_table=False,
                             save_dir=str(tmp_path / "p"))
    # every non-void pixel of all 5 images appears exactly once in the hist
    expected = sum(int((ds[i]["label"] != 0).sum()) for i in range(5))
    assert int(hist.sum()) == expected
    # PNG dumps exist for exactly the 5 real samples
    assert len(glob.glob(str(tmp_path / "p" / "*_label.png"))) == 5


def test_hist_total_is_int64():
    # Big sweeps (Cityscapes full val ~1.05e9 px) overflow an int32 total;
    # evaluate() must hand back an int64 host accumulation.
    cfg, state, ds = _setup(n_samples=2, bs=2)
    _, hist, _ = evaluate(state, cfg, ds, print_table=False)
    assert hist.dtype == np.int64


def test_saves_prob_dumps(tmp_path):
    cfg, state, ds = _setup(n_samples=2, bs=2)
    evaluate(state, cfg, ds, print_table=False,
             save_dir=str(tmp_path / "p"), saves_prob=True)
    probs = sorted(glob.glob(str(tmp_path / "p" / "*_prob.npy")))
    assert len(probs) == 2
    arr = np.load(probs[0])
    assert arr.shape == (32, 32, 40)
    np.testing.assert_allclose(arr.sum(-1), 1.0, atol=2e-2)  # fp16 softmax


def test_submit_dir_cityscapes_labelids(tmp_path):
    """--submit_dir dumps evaluation-server-format predictions: labelIds
    PNGs at the native label resolution, named after the source frames,
    values = the inverse of the training remap table."""
    from PIL import Image

    from mcseg_tpu.data.datasets import get_dataset
    from mcseg_tpu.data.labels import (
        cityscapes_id_to_train_table, get_submit_table)
    from tests.test_corpus_layouts import make_cityscapes

    make_cityscapes(tmp_path / "city", n=3, splits=("val",))
    cfg = ExperimentConfig(
        model=ModelConfig(net="drn_d_22", input_ch=3, n_class=19,
                          dtype="float32"),
        data=DataConfig(src_dataset="gta5", tgt_dataset="city",
                        data_root=str(tmp_path), batch_size=2,
                        train_img_shape=(64, 32), test_img_shape=(64, 32),
                        input_ch=3),
        train=TrainConfig(),
    )
    state, _, _ = create_train_state(cfg.model, cfg.train, jax.random.key(0),
                                     img_shape=(32, 64))
    ds = get_dataset("city", cfg.data, "val")
    evaluate(state, cfg, ds, print_table=False,
             submit_dir=str(tmp_path / "submit"))
    files = sorted(glob.glob(str(tmp_path / "submit" / "*.png")))
    # named after the source frames (the server matches <city>_<seq>_<frame>)
    assert [f.split("/")[-1] for f in files] == [
        f"cityA_{i:06d}_000019_leftImg8bit.png" for i in range(3)]
    arr = np.asarray(Image.open(files[0]))
    # native Cityscapes label resolution, valid labelIds only, and the
    # training remap inverts the dump back to train ids with no ignores
    assert arr.shape == (1024, 2048)
    table = get_submit_table("city")
    assert set(np.unique(arr)).issubset(set(table[:19].tolist()))
    back = cityscapes_id_to_train_table()[arr]
    assert back.max() <= 18


def test_submit_dir_rejected_for_non_submission_corpus():
    import pytest

    cfg, state, ds = _setup(n_samples=2, bs=2)
    with pytest.raises(ValueError, match="submission"):
        evaluate(state, cfg, ds, print_table=False, submit_dir="/tmp/x")


def test_averaged_head_equals_two_apply_fp64():
    """The pooled eval head (one conv with 0.5*(k1+k2), _averaged_head_params)
    must equal the protocol's explicit 0.5*(F1(feat)+F2(feat)) — both the
    score conv and the fixed bilinear upsample are linear, so the rewrite is
    exact up to fp summation order. fp64 bounds it at 1e-12."""
    import jax.numpy as jnp

    from mcseg_tpu.eval.tester import _averaged_head_params, make_infer_fn
    from mcseg_tpu.models.factory import get_models
    from mcseg_tpu.train.apply import apply_classifier

    jax.config.update("jax_enable_x64", True)
    try:
        cfg = ExperimentConfig(
            model=ModelConfig(net="drn_d_22", input_ch=3, n_class=40,
                              dtype="float64"),
            data=DataConfig(src_dataset="synthetic", tgt_dataset="synthetic",
                            batch_size=2, train_img_shape=(32, 32),
                            test_img_shape=(32, 32), input_ch=3,
                            max_samples=2),
            train=TrainConfig(),
        )
        state, _, _ = create_train_state(cfg.model, cfg.train,
                                         jax.random.key(0),
                                         img_shape=(32, 32))
        # distinct F1/F2: perturb F2 so the average is non-trivial
        params = jax.device_get(state.params)
        params["F2"] = jax.tree.map(lambda x: x + 0.01, params["F2"])
        g, f1, f2 = get_models(cfg.model)
        avg = _averaged_head_params(f1, params["F1"], f2, params["F2"])
        assert avg is not None
        r = np.random.RandomState(0)
        batch = {
            "image": r.randint(0, 255, (2, 32, 32, 3)).astype(np.uint8),
            "label": r.randint(0, 40, (2, 32, 32)).astype(np.uint8),
        }
        infer = make_infer_fn(cfg, average_classifiers=True,
                              out_shape=(32, 32))
        logits, _, feat = infer(params, state.batch_stats, batch)
        o1 = apply_classifier(f1, params["F1"], feat, False)
        o2 = apply_classifier(f2, params["F2"], feat, False)
        want = 0.5 * (o1 + o2)
        assert logits.dtype == jnp.float64
        np.testing.assert_allclose(np.asarray(logits), np.asarray(want),
                                   rtol=0, atol=1e-12)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_averaged_head_rejects_mismatched_heads():
    """Late-fusion / non-PixelClassifier heads must fall back to two-apply."""
    from mcseg_tpu.core.config import ModelConfig
    from mcseg_tpu.eval.tester import _averaged_head_params
    from mcseg_tpu.models.factory import get_models

    cfg_m = ModelConfig(net="drn_d_22", input_ch=6, n_class=40,
                        dtype="float32", fusion="late")
    g, f1, f2 = get_models(cfg_m)
    assert _averaged_head_params(f1, {}, f2, {}) is None
