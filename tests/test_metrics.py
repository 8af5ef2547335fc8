"""fast-hist / mIoU vs hand-computed confusion matrices (SURVEY.md section 4)."""

import jax.numpy as jnp
import numpy as np

from mcseg_tpu.eval.metrics import (
    fast_hist,
    format_iou_table,
    miou_from_hist,
    per_class_iu,
    pixel_accuracy,
)


def test_fast_hist_hand_computed():
    gt = jnp.asarray([0, 0, 1, 1, 2, 2])
    pred = jnp.asarray([0, 1, 1, 1, 2, 0])
    hist = np.asarray(fast_hist(gt, pred, 3))
    expected = np.array([[1, 1, 0], [0, 2, 0], [1, 0, 1]])
    np.testing.assert_array_equal(hist, expected)


def test_fast_hist_ignores_255_and_out_of_range():
    gt = jnp.asarray([0, 255, 1, 7])
    pred = jnp.asarray([0, 0, 1, 1])
    hist = np.asarray(fast_hist(gt, pred, 3))
    assert hist.sum() == 2
    np.testing.assert_array_equal(np.diag(hist), [1, 1, 0])


def test_per_class_iu_and_miou():
    hist = np.array([[1, 1, 0], [0, 2, 0], [1, 0, 1]])
    iu = per_class_iu(hist)
    # class0: 1/(2+2-1)=1/3; class1: 2/(2+3-2)=2/3; class2: 1/(2+1-1)=1/2
    np.testing.assert_allclose(iu, [1 / 3, 2 / 3, 1 / 2])
    np.testing.assert_allclose(miou_from_hist(hist), np.mean([1 / 3, 2 / 3, 1 / 2]))


def test_miou_skips_absent_classes():
    hist = np.zeros((3, 3))
    hist[0, 0] = 5
    hist[1, 1] = 5
    # class 2 never appears -> NaN, excluded from the mean
    np.testing.assert_allclose(miou_from_hist(hist), 1.0)


def test_pixel_accuracy():
    hist = np.array([[3, 1], [1, 5]])
    np.testing.assert_allclose(pixel_accuracy(hist), 8 / 10)


def test_format_iou_table_parses():
    hist = np.array([[1, 1], [0, 2]])
    table = format_iou_table(hist, ["road", "car"])
    assert "road" in table and "mIoU" in table and "pixel acc" in table


def test_hist_accumulation_matches_single_shot():
    rng = np.random.RandomState(0)
    gt = rng.randint(0, 5, size=(4, 16, 16))
    pred = rng.randint(0, 5, size=(4, 16, 16))
    total = np.zeros((5, 5), np.int64)
    for i in range(4):
        total += np.asarray(fast_hist(jnp.asarray(gt[i]), jnp.asarray(pred[i]), 5))
    single = np.asarray(fast_hist(jnp.asarray(gt), jnp.asarray(pred), 5))
    np.testing.assert_array_equal(total, single)
