"""End-to-end smoke tests — BASELINE config 1 ('RGB-only DRN-D-38 source-only,
mini split, CPU': here with the d_22 trunk for CPU compile time; the flagship
d_38 path is exercised by __graft_entry__/bench): full train loop (host
pipeline -> device preprocess -> train step -> checkpoint) runs, loss
decreases, and the tester produces a parseable IoU table; then the MCD adapt
loop on synthetic source/target; then checkpoint -> tester round-trip."""

import os

import numpy as np
import pytest

from mcseg_tpu.core.config import DataConfig, ExperimentConfig, ModelConfig, TrainConfig
from mcseg_tpu.data.datasets import SyntheticDataset
from mcseg_tpu.eval.tester import evaluate
from mcseg_tpu.train.loops import train_adapt, train_source
from mcseg_tpu.utils.checkpoint import load_checkpoint
from mcseg_tpu.utils.logging import JsonlLogger


def _cfg(tmp_path, **train_kw):
    model = ModelConfig(net="drn_d_22", input_ch=3, n_class=40, dtype="float32")
    data = DataConfig(
        src_dataset="synthetic", tgt_dataset="synthetic", batch_size=8,
        train_img_shape=(32, 32), test_img_shape=(32, 32), input_ch=3,
        max_samples=16,
    )
    train_kw.setdefault("lr", 0.05)
    train_kw.setdefault("lr_schedule", "constant")
    train_kw.setdefault("epochs", 2)
    train_kw.setdefault("num_k", 2)
    train_kw.setdefault("log_every", 1)
    train = TrainConfig(out_dir=str(tmp_path / "run"), max_steps=100, **train_kw)
    return ExperimentConfig(model=model, data=data, train=train)


class _Capture(JsonlLogger):
    def __init__(self):
        super().__init__(path=None, echo=False)
        self.records = []

    def log(self, record):
        self.records.append(record)


@pytest.mark.slow
def test_source_train_loop_e2e(tmp_path):
    cfg = _cfg(tmp_path)
    logger = _Capture()
    state = train_source(cfg, logger=logger, max_iterations=4)
    losses = [r["loss"] for r in logger.records]
    assert len(losses) == 4
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    assert os.path.exists(str(tmp_path / "run" / "last.msgpack"))

    # tester: checkpoint -> rebuild from embedded config -> IoU table
    restored, rcfg = load_checkpoint(str(tmp_path / "run" / "last"))
    ds = SyntheticDataset(rcfg.data, "val")
    miou, hist, table = evaluate(
        restored, rcfg, ds, average_classifiers=False,
        max_batches=1, print_table=False,
    )
    assert 0.0 <= miou <= 1.0
    assert "mIoU" in table
    assert hist.sum() > 0


@pytest.mark.slow
def test_adapt_train_loop_e2e(tmp_path):
    cfg = _cfg(tmp_path, epochs=1)
    logger = _Capture()
    train_adapt(cfg, logger=logger, max_iterations=2)
    rec = logger.records[-1]
    for k in ("loss_source", "loss_b", "loss_dis"):
        assert np.isfinite(rec[k]), rec


@pytest.mark.slow
def test_adapt_resume_from_checkpoint(tmp_path):
    import dataclasses

    cfg = _cfg(tmp_path, epochs=1)
    train_adapt(cfg, logger=_Capture(), max_iterations=2)
    ckpt = str(tmp_path / "run" / "last")
    # resume with a LARGER epoch budget: --epochs is the total, and resume
    # continues at the checkpointed epoch (reference adapt_trainer's
    # `range(start_epoch, num_epochs)`), so epochs=1 would be a no-op here.
    cfg2 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, resume=ckpt, epochs=2,
                                       out_dir=str(tmp_path / "run2")),
    )
    logger = _Capture()
    state = train_adapt(cfg2, logger=logger, max_iterations=1)
    assert int(state.step) >= 3  # continued counting from the checkpoint


@pytest.mark.slow
def test_eval_every_epochs_hook(tmp_path, capsys):
    """--eval_every_epochs: epoch-end mesh-sharded val mIoU from the CLI."""
    from mcseg_tpu.cli import source_train

    source_train.main([
        "synthetic", "--net", "drn_d_22", "--dtype", "float32",
        "--batch_size", "8", "--train_img_shape", "32", "32",
        "--max_samples", "8", "--epochs", "1", "--lr", "0.02",
        "--lr_schedule", "constant", "--log_every", "1",
        "--eval_every_epochs", "1", "--out_dir", str(tmp_path / "run"),
    ])
    out = capsys.readouterr().out
    assert "val_miou=" in out


@pytest.mark.slow
def test_resume_replays_identical_data_stream(tmp_path):
    """An interrupted-and-resumed run is BIT-IDENTICAL to an uninterrupted
    one: --resume fast-forwards the shuffled data stream to the checkpoint's
    epoch (the reference's adapt_trainer continues its epoch loop the same
    way), and the per-step RNG folds from state.step."""
    import dataclasses

    import jax

    cfg4 = _cfg(tmp_path, epochs=4)
    straight = train_source(
        dataclasses.replace(
            cfg4, train=dataclasses.replace(
                cfg4.train, out_dir=str(tmp_path / "straight"))),
        logger=_Capture())

    cfg2 = dataclasses.replace(
        cfg4, train=dataclasses.replace(
            cfg4.train, epochs=2, out_dir=str(tmp_path / "part1")))
    train_source(cfg2, logger=_Capture())
    cfgr = dataclasses.replace(
        cfg4, train=dataclasses.replace(
            cfg4.train, resume=str(tmp_path / "part1" / "last"),
            out_dir=str(tmp_path / "part2")))
    resumed = train_source(cfgr, logger=_Capture())

    assert int(resumed.step) == int(straight.step)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        resumed.params, straight.params)


def test_sigterm_writes_final_checkpoint_and_exits(tmp_path):
    """Preemption contract (train/loops.py:_GracefulStop): SIGTERM lets the
    in-flight iteration finish, then the loop exits cleanly through the
    normal end-of-training path — final `last` checkpoint written, state
    returned, and the checkpoint is resumable. Also: no stray .tmp files
    from the atomic checkpoint writes."""
    import glob
    import signal

    cfg = _cfg(tmp_path, epochs=50)  # 16/8 = 2 steps/epoch -> 100 steps
    hits = []

    def hook(epoch, state):
        hits.append(epoch)
        if epoch == 2:
            os.kill(os.getpid(), signal.SIGTERM)

    state = train_source(cfg, on_epoch_end=hook)
    # stopped right after epoch 2 (step 4), far short of the 100-step run
    assert hits == [1, 2]
    assert int(np.asarray(state.step)) == 4
    assert os.path.exists(str(tmp_path / "run" / "last.msgpack"))
    assert glob.glob(str(tmp_path / "run" / "*.tmp")) == []
    # the handler stack is restored after the loop
    assert signal.getsignal(signal.SIGTERM) is signal.SIG_DFL

    restored, rcfg = load_checkpoint(str(tmp_path / "run" / "last"))
    assert int(np.asarray(restored.step)) == 4


def test_max_hours_budget_stops_gracefully(tmp_path):
    """--max_hours: a tiny wall-clock budget stops the run after the first
    iteration via the graceful path — final checkpoint written, resumable."""
    cfg = _cfg(tmp_path, epochs=50, max_hours=1e-7)  # ~0.4 ms budget
    state = train_source(cfg)
    assert 1 <= int(np.asarray(state.step)) < 100
    restored, _ = load_checkpoint(str(tmp_path / "run" / "last"))
    assert int(np.asarray(restored.step)) == int(np.asarray(state.step))
