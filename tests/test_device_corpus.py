"""HBM-resident corpus (data/device_corpus.py): the stream must be
bit-identical to the host pipeline (same seed => same batches, same wire
format), the 'auto' gate must respect the budget, and training through the
device path must produce exactly the parameters the host path produces."""

import dataclasses

import jax
import numpy as np
import pytest

from mcseg_tpu.core.config import DataConfig, ExperimentConfig, ModelConfig, TrainConfig
from mcseg_tpu.data.datasets import SyntheticDataset, ZipDataset
from mcseg_tpu.data.device_corpus import (
    corpus_fits,
    corpus_stream,
    resolve_device_corpus,
    stage_corpus,
)
from mcseg_tpu.data.pipeline import batch_iterator, device_prefetch
from mcseg_tpu.parallel.mesh import make_mesh

HW = (32, 32)


def _dcfg(**kw):
    base = dict(src_dataset="synthetic", tgt_dataset="synthetic",
                batch_size=4, train_img_shape=HW, test_img_shape=HW,
                input_ch=6, n_class=5, max_samples=8, num_workers=0)
    base.update(kw)
    return DataConfig(**base)


def _tree_equal(a, b):
    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_stream_matches_host_pipeline_zip():
    """Same seed => the device-corpus stream equals the host path batch for
    batch, including uint16-mm depth and the dropped target label."""
    cfg = _dcfg()
    mesh = make_mesh(1)
    ds = ZipDataset(SyntheticDataset(cfg, "train"), SyntheticDataset(cfg, "train"))
    host = device_prefetch(
        batch_iterator(ds, 4, seed=3, epochs=2), mesh)
    dev = corpus_stream(ds, mesh, 4, seed=3, epochs=2)
    n = 0
    for (hs, ht), (vs, vt) in zip(host, dev):
        assert "label" in hs and "label" not in ht
        assert set(hs) == set(vs) and set(ht) == set(vt)
        assert vs["depth"].dtype == np.uint16  # wire format on device too
        _tree_equal(hs, vs)
        _tree_equal(ht, vt)
        n += 1
    assert n == 4  # 8 samples / batch 4 x 2 epochs, both streams exhausted


def test_stream_matches_host_pipeline_single_and_resume():
    cfg = _dcfg()
    mesh = make_mesh(1)
    ds = SyntheticDataset(cfg, "train")
    host = list(device_prefetch(
        batch_iterator(ds, 4, seed=0, epochs=3, start_epoch=1), mesh))
    dev = list(corpus_stream(ds, mesh, 4, seed=0, epochs=3, start_epoch=1))
    assert len(host) == len(dev) == 4
    for h, v in zip(host, dev):
        _tree_equal(h, v)


def test_auto_gate_respects_budget():
    cfg = _dcfg()
    ds = SyntheticDataset(cfg, "train")
    assert corpus_fits(ds, 1.0)
    assert not corpus_fits(ds, 1e-6)
    assert resolve_device_corpus(dataclasses.replace(cfg, device_corpus="auto",
                                                     device_corpus_gb=1.0), ds)
    assert not resolve_device_corpus(
        dataclasses.replace(cfg, device_corpus="auto", device_corpus_gb=1e-6), ds)
    assert resolve_device_corpus(
        dataclasses.replace(cfg, device_corpus="on", device_corpus_gb=1e-6), ds)
    assert not resolve_device_corpus(dataclasses.replace(cfg, device_corpus="off"), ds)
    with pytest.raises(ValueError, match="device_corpus"):
        resolve_device_corpus(dataclasses.replace(cfg, device_corpus="yes"), ds)


def test_staged_corpus_is_replicated_on_mesh():
    cfg = _dcfg()
    mesh = make_mesh(8)
    ds = SyntheticDataset(cfg, "train")
    corpus = stage_corpus(ds, mesh)
    for v in corpus.values():
        assert v.sharding.is_fully_replicated
    # gathered batches shard on 'data'
    batch = next(corpus_stream(ds, mesh, 8, seed=0, epochs=1))
    for v in batch.values():
        assert not v.sharding.is_fully_replicated


def _train_cfg(tmp_path, device_corpus, out):
    return ExperimentConfig(
        model=ModelConfig(net="drn_d_22", input_ch=3, n_class=5, dtype="float32"),
        data=_dcfg(input_ch=3, batch_size=8, device_corpus=device_corpus),
        train=TrainConfig(lr=0.05, epochs=2, lr_schedule="constant",
                          max_steps=100, log_every=10,
                          out_dir=str(tmp_path / out)),
    )


@pytest.mark.slow
def test_training_identical_device_corpus_on_vs_off(tmp_path):
    """device_corpus must not change training AT ALL: params after 2 epochs
    through the HBM-resident path == host-pipeline path, bitwise."""
    from mcseg_tpu.train.loops import train_source

    s_on = train_source(_train_cfg(tmp_path, "on", "on"))
    s_off = train_source(_train_cfg(tmp_path, "off", "off"))
    _tree_equal(s_on.params, s_off.params)
    _tree_equal(s_on.opt_g, s_off.opt_g)


def test_stage_corpus_rejects_inconsistent_planes():
    """A corpus whose samples disagree on the plane set (e.g. a partially
    populated depth/ directory) must fail loudly — silently skipping the
    fill would stage uninitialized np.empty memory as training input."""
    from mcseg_tpu.data.device_corpus import stage_corpus

    class Inconsistent:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            s = {"image": np.zeros((8, 8, 3), np.uint8),
                 "label": np.zeros((8, 8), np.uint8)}
            if i < 2:  # first chunk has depth, later ones don't
                s["depth"] = np.zeros((8, 8), np.float32)
            return s

    mesh = make_mesh(1)
    with pytest.raises(ValueError, match="inconsistent planes"):
        stage_corpus(Inconsistent(), mesh, chunk=2)


def test_device_prefetch_worker_exits_on_abandoned_iterator():
    """A consumer that breaks early (graceful stop, max_iterations) must not
    leak a worker thread blocked on a full queue."""
    import threading
    import time

    cfg = DataConfig(src_dataset="synthetic", tgt_dataset="synthetic",
                     batch_size=2, train_img_shape=(16, 16), input_ch=3,
                     max_samples=8)
    ds = SyntheticDataset(cfg, "train")
    mesh = make_mesh(1)
    before = {t.name for t in threading.enumerate()}
    it = device_prefetch(batch_iterator(ds, 2, epochs=None), mesh, depth=1)
    next(it)  # start the worker, consume one batch
    it.close()  # abandon mid-stream (what a broken-out-of loop does via GC)
    deadline = time.time() + 5.0
    while time.time() < deadline:
        leaked = [t for t in threading.enumerate()
                  if t.name not in before and t.is_alive()
                  and "decode" not in t.name]
        if not leaked:
            break
        time.sleep(0.1)
    assert not leaked, f"prefetch worker leaked: {leaked}"
