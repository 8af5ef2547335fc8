"""Learning-quality regression: the full pipeline (device preprocess + source
step) actually learns the synthetic RGB-D task to reasonable mIoU, and the
late-fusion MCD path (BASELINE config 5) runs on the 8-device mesh."""

import dataclasses

import numpy as np
import pytest

from mcseg_tpu.core.config import DataConfig, ExperimentConfig, ModelConfig, TrainConfig
from mcseg_tpu.data.datasets import SyntheticDataset
from mcseg_tpu.eval.tester import evaluate
from mcseg_tpu.train.loops import train_adapt, train_source
from mcseg_tpu.utils.logging import JsonlLogger


class _Quiet(JsonlLogger):
    def __init__(self):
        super().__init__(path=None, echo=False)
        self.records = []

    def log(self, r):
        self.records.append(r)


@pytest.mark.slow
def test_source_training_reaches_reasonable_miou(tmp_path):
    cfg = ExperimentConfig(
        model=ModelConfig(net="drn_d_22", input_ch=3, n_class=40, dtype="float32"),
        data=DataConfig(
            src_dataset="synthetic", tgt_dataset="synthetic", batch_size=8,
            train_img_shape=(64, 48), test_img_shape=(64, 48), input_ch=3,
            max_samples=24, random_crop=False,
        ),
        train=TrainConfig(lr=0.05, lr_schedule="constant", epochs=15,
                          max_steps=1000, log_every=5,
                          out_dir=str(tmp_path / "run")),
    )
    logger = _Quiet()
    state = train_source(cfg, logger=logger, max_iterations=45)
    ds = SyntheticDataset(cfg.data, "train")  # train-distribution eval
    miou, hist, _ = evaluate(state, cfg, ds, average_classifiers=False,
                             max_batches=2, print_table=False)
    # 45 steps is a smoke budget, not convergence: a learning pipeline reaches
    # ~0.15 mIoU / ~0.55 pixel acc here (measured); a broken one (bad remap /
    # loss masking / geometry misalignment) stays near chance (~0.02 / ~0.2)
    from mcseg_tpu.eval.metrics import pixel_accuracy

    assert miou > 0.10, (miou, logger.records[-1])
    assert pixel_accuracy(hist) > 0.45, pixel_accuracy(hist)
    assert logger.records[-1]["loss"] < 3.0


@pytest.mark.slow
def test_late_fusion_mcd_on_mesh(tmp_path):
    """BASELINE config 5: dual-branch score-fusion MCD, data-parallel mesh."""
    cfg = ExperimentConfig(
        model=ModelConfig(net="drn_d_22", input_ch=6, n_class=40,
                          fusion="late", dtype="float32"),
        data=DataConfig(
            src_dataset="synthetic", tgt_dataset="synthetic", batch_size=8,
            train_img_shape=(32, 32), test_img_shape=(32, 32), input_ch=6,
            max_samples=8,
        ),
        train=TrainConfig(lr=0.01, num_k=1, epochs=1, max_steps=100,
                          log_every=1, out_dir=str(tmp_path / "run")),
    )
    logger = _Quiet()
    train_adapt(cfg, logger=logger, max_iterations=1)
    rec = logger.records[-1]
    for k in ("loss_source", "loss_b", "loss_dis"):
        assert np.isfinite(rec[k]), rec
