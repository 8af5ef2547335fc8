"""Serving export (eval/serving.py): the AOT artifact computes the same
predictions as the live inference path, round-trips through bytes on disk,
and the CLI writes artifact + manifest."""

import json

import jax
import numpy as np
import pytest

from mcseg_tpu.core.config import (
    DataConfig, ExperimentConfig, ModelConfig, TrainConfig)
from mcseg_tpu.eval.serving import export_serving, load_serving, make_serve_fn
from mcseg_tpu.train.state import create_train_state


def _setup(input_ch=3, n_class=8):
    cfg = ExperimentConfig(
        model=ModelConfig(net="drn_d_22", input_ch=input_ch, n_class=n_class,
                          dtype="float32"),
        data=DataConfig(src_dataset="synthetic", tgt_dataset="synthetic",
                        batch_size=2, train_img_shape=(32, 32),
                        test_img_shape=(32, 32), input_ch=input_ch),
        train=TrainConfig(),
    )
    state, _, _ = create_train_state(cfg.model, cfg.train, jax.random.key(0),
                                     img_shape=(32, 32))
    return cfg, state


def test_exported_artifact_matches_live_inference(tmp_path):
    cfg, state = _setup()
    rng = np.random.RandomState(0)
    batch = {"image": rng.randint(0, 255, (2, 32, 32, 3)).astype(np.uint8)}

    serve = jax.jit(make_serve_fn(cfg, state.params, state.batch_stats))
    live = np.asarray(serve(batch))

    path = str(tmp_path / "m.shlo")
    manifest = export_serving(cfg, state.params, state.batch_stats, path,
                              batch=2, platforms=("cpu",))
    assert manifest["bytes"] > 0 and manifest["platforms"] == ["cpu"]
    pred = np.asarray(load_serving(path)(batch))
    assert pred.shape == (2, 32, 32) and pred.dtype == np.int32
    np.testing.assert_array_equal(pred, live)


def test_export_depth_input_and_probs(tmp_path):
    # input_ch=6: raw depth plane -> on-device HHA inside the artifact
    cfg, state = _setup(input_ch=6)
    rng = np.random.RandomState(1)
    batch = {
        "image": rng.randint(0, 255, (1, 32, 32, 3)).astype(np.uint8),
        "depth": (rng.rand(1, 32, 32) * 4 + 0.5).astype(np.float32),
    }
    path = str(tmp_path / "m6.shlo")
    manifest = export_serving(cfg, state.params, state.batch_stats, path,
                              batch=1, platforms=("cpu",), with_probs=True)
    assert "depth" in manifest["input_spec"]
    pred, probs = load_serving(path)(batch)
    assert np.asarray(pred).shape == (1, 32, 32)
    probs = np.asarray(probs)
    assert probs.shape == (1, 32, 32, cfg.model.n_class)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)


@pytest.mark.slow
def test_export_cli_roundtrip(tmp_path):
    from mcseg_tpu.tools.export_serving import main as export_main
    from mcseg_tpu.utils.checkpoint import save_checkpoint

    cfg, state = _setup()
    save_checkpoint(str(tmp_path / "ck"), state, cfg)
    out = str(tmp_path / "model.shlo")
    export_main([str(tmp_path / "ck"), "--out", out, "--batch", "1",
                 "--platforms", "cpu"])
    with open(out + ".json") as f:
        manifest = json.load(f)
    assert manifest["net"] == "drn_d_22"
    assert manifest["input_spec"]["image"]["shape"] == [1, 32, 32, 3]
    batch = {"image": np.zeros((1, 32, 32, 3), np.uint8)}
    assert np.asarray(load_serving(out)(batch)).shape == (1, 32, 32)


def test_export_tolerates_missing_data_root(tmp_path):
    import dataclasses

    cfg, state = _setup()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(
            cfg.data, tgt_dataset="nyu", data_root="/nonexistent/training/host"))
    m = export_serving(cfg, state.params, state.batch_stats,
                       str(tmp_path / "m.shlo"), batch=1, platforms=("cpu",))
    # falls back to the checkpoint's test_img_shape geometry
    assert m["input_spec"]["image"]["shape"] == [1, 32, 32, 3]


def test_export_precomputed_hha_plane(tmp_path):
    # input_ch=6 trained on precomputed HHA files (hha_on_device=False):
    # the artifact must ingest a uint8 'hha' plane, NOT raw depth
    import dataclasses

    cfg, state = _setup(input_ch=6)
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, hha_on_device=False))
    path = str(tmp_path / "mh.shlo")
    m = export_serving(cfg, state.params, state.batch_stats, path,
                       batch=1, platforms=("cpu",))
    assert m["extra_plane"] == "hha" and "depth" not in m["input_spec"]
    rng = np.random.RandomState(2)
    batch = {
        "image": rng.randint(0, 255, (1, 32, 32, 3)).astype(np.uint8),
        "hha": rng.randint(0, 255, (1, 32, 32, 3)).astype(np.uint8),
    }
    assert np.asarray(load_serving(path)(batch)).shape == (1, 32, 32)


def test_export_depth_only_needs_no_image(tmp_path):
    # input_ch=1: the RGB plane is dead code; clients ship only depth
    cfg, state = _setup(input_ch=1)
    path = str(tmp_path / "m1.shlo")
    m = export_serving(cfg, state.params, state.batch_stats, path,
                       batch=1, platforms=("cpu",))
    assert list(m["input_spec"]) == ["depth"]
    assert "per-batch depth max" in m["note"]
    batch = {"depth": (np.random.RandomState(3).rand(1, 32, 32) * 4 + 0.5)
             .astype(np.float32)}
    assert np.asarray(load_serving(path)(batch)).shape == (1, 32, 32)
