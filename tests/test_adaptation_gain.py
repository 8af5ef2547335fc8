"""Outcome-level UDA evidence (VERDICT r4 #1/#2/#6): MCD adaptation IMPROVES
target-domain mIoU under a controlled domain shift.

The harness: source = clean SyntheticDataset, target = SyntheticShiftedDataset
(same scene/label distribution, deterministic per-class color rotation +
illumination/noise change — data/datasets.py). Source-only training learns
color-keyed features that break on the shifted target; MCD's min-max on
classifier discrepancy (reference adapt_trainer.py semantics, SURVEY.md
section 3.2) adapts the generator to the target distribution. The assertions
are the reference's reason to exist, stated as tests:

  * MCD target-val mIoU beats source-only by a clear margin at an identical
    iteration budget;
  * the discrepancy loss falls over adaptation (the min-max is working);
  * the ``--uses_one_classifier`` ablation (discrepancy identically 0)
    keeps only the incidental BN-adaptation sliver of the gain and lands
    clearly BELOW real MCD — the gain is attributable to the two-classifier
    discrepancy machinery, not to extra target forwards.

CPU-sized: drn_d_22, 64x48, fp32, deterministic seeds. The SAME harness at
the same budgets on TPU hardware (docs/ARCHITECTURE.md "adaptation A/B")
measures src 0.109 / one-clf 0.128 / MCD 0.161 mIoU at it=200 — the three
arms here are that record's regression guard.
"""

import numpy as np
import pytest

from mcseg_tpu.core.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from mcseg_tpu.data.datasets import get_dataset
from mcseg_tpu.eval.tester import evaluate
from mcseg_tpu.train.loops import train_adapt, train_source
from mcseg_tpu.utils.logging import JsonlLogger

ITERS = 200
SHAPE = (64, 48)  # (W, H)


class _Quiet(JsonlLogger):
    def __init__(self):
        super().__init__(path=None, echo=False)
        self.records = []

    def log(self, r):
        self.records.append(r)


def _cfg(out_dir, one_classifier=False):
    return ExperimentConfig(
        model=ModelConfig(net="drn_d_22", input_ch=3, n_class=40,
                          dtype="float32",
                          uses_one_classifier=one_classifier),
        data=DataConfig(src_dataset="synthetic",
                        tgt_dataset="synthetic_shifted",
                        batch_size=8, train_img_shape=SHAPE,
                        test_img_shape=SHAPE, input_ch=3, max_samples=32,
                        random_crop=False, domain_shift=1.0),
        train=TrainConfig(lr=0.05, lr_schedule="constant", epochs=500,
                          num_k=4, max_steps=10_000, log_every=10,
                          out_dir=str(out_dir), checkpoint_every_epochs=0),
    )


def _target_miou(state, cfg, avg):
    ds = get_dataset("synthetic_shifted", cfg.data, "val")
    miou, hist, _ = evaluate(state, cfg, ds, average_classifiers=avg,
                             max_batches=4, print_table=False)
    return miou


# Each arm trains ONCE per session (module fixtures): the two tests below
# share the source-only baseline instead of re-training it.

@pytest.fixture(scope="module")
def source_arm(tmp_path_factory):
    cfg = _cfg(tmp_path_factory.mktemp("src"))
    st = train_source(cfg, logger=_Quiet(), max_iterations=ITERS)
    return _target_miou(st, cfg, avg=False)


@pytest.fixture(scope="module")
def mcd_arm(tmp_path_factory):
    cfg = _cfg(tmp_path_factory.mktemp("mcd"))
    log = _Quiet()
    st = train_adapt(cfg, logger=log, max_iterations=ITERS)
    return _target_miou(st, cfg, avg=True), log.records


@pytest.mark.slow
def test_mcd_beats_source_only_under_domain_shift(source_arm, mcd_arm):
    miou_src, (miou_mcd, records) = source_arm, mcd_arm

    # the headline behavior: adaptation GAIN on the shifted target at an
    # identical iteration budget. Margin: the TPU-hardware run of this
    # harness measures src 0.109 vs MCD 0.161 at it=200 (0.101 vs 0.163 at
    # it=400); require the gap well above seed jitter.
    assert miou_mcd > miou_src + 0.03, (
        f"no adaptation gain: source-only {miou_src:.3f} vs MCD {miou_mcd:.3f}")

    # the min-max is engaged: discrepancy falls from its early peak
    dis = [float(r["loss_dis"]) for r in records]
    assert np.mean(dis[-3:]) < np.mean(dis[:3]), dis


@pytest.mark.slow
def test_one_classifier_ablation_shows_no_gain(tmp_path, source_arm, mcd_arm):
    """--uses_one_classifier ties F2:=F1: the discrepancy is identically 0,
    so 'adaptation' collapses to source training with extra target BN
    forwards — it must land clearly below real MCD and close to the
    source-only baseline (VERDICT r4 #6)."""
    miou_src, (miou_mcd, _) = source_arm, mcd_arm
    cfg_one = _cfg(tmp_path / "one", one_classifier=True)
    log_one = _Quiet()
    st_one = train_adapt(cfg_one, logger=log_one, max_iterations=ITERS)
    miou_one = _target_miou(st_one, cfg_one, avg=True)

    # discrepancy identically zero throughout
    assert max(abs(float(r["loss_dis"])) for r in log_one.records) < 1e-6
    # the discrepancy machinery is what separates MCD from the ablation
    # (hardware record: one-clf 0.128 vs MCD 0.161 at it=200)
    assert miou_one < miou_mcd - 0.01, (miou_one, miou_mcd)
    # and the ablation keeps at most the BN-adaptation sliver over source
    assert miou_one < miou_src + 0.05, (miou_src, miou_one)
