"""mIoU evaluation — fast-hist confusion accumulation.

Counterpart of the reference's tester-internal ``fast_hist`` /
``per_class_iu`` (SURVEY.md sections 2 and 3.3): confusion matrix via
``bincount(n_class * gt + pred)`` over valid pixels, per-class
IoU = diag / (rowsum + colsum - diag), mean over classes present in GT.

``fast_hist`` is jit-friendly (static output shape [n, n], a one-hot
scatter-add XLA turns into an efficient segmented sum) so it can run on-device
inside the eval step and be ``psum``-reduced across the data mesh axis; only
the final [n, n] matrix ever reaches the host.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np


def fast_hist(
    gt: jnp.ndarray, pred: jnp.ndarray, n_class: int, ignore_index: int = 255
) -> jnp.ndarray:
    """Confusion matrix [n_class, n_class]; rows = GT, cols = prediction.
    Pixels whose GT is ignore_index (or out of range) are dropped."""
    gt = gt.reshape(-1).astype(jnp.int32)
    pred = pred.reshape(-1).astype(jnp.int32)
    valid = (gt >= 0) & (gt < n_class) & (gt != ignore_index)
    idx = jnp.where(valid, gt * n_class + pred, n_class * n_class)
    hist = jnp.bincount(idx, length=n_class * n_class + 1)[:-1]
    return hist.reshape(n_class, n_class)


def per_class_iu(hist) -> np.ndarray:
    hist = np.asarray(hist, dtype=np.float64)
    denom = hist.sum(axis=1) + hist.sum(axis=0) - np.diag(hist)
    with np.errstate(divide="ignore", invalid="ignore"):
        iu = np.diag(hist) / denom
    return iu  # NaN for classes absent from both GT and prediction


def miou_from_hist(hist) -> float:
    iu = per_class_iu(hist)
    return float(np.nanmean(iu))


def pixel_accuracy(hist) -> float:
    hist = np.asarray(hist, dtype=np.float64)
    total = hist.sum()
    return float(np.diag(hist).sum() / total) if total else 0.0


def format_iou_table(hist, class_names: Optional[Sequence[str]] = None) -> str:
    """Human-readable per-class IoU table, like the reference testers print."""
    iu = per_class_iu(hist)
    n = len(iu)
    if class_names is None:
        class_names = [f"class_{i}" for i in range(n)]
    width = max(len(c) for c in class_names) + 2
    lines = ["per-class IoU:"]
    for name, v in zip(class_names, iu):
        sv = "  n/a" if np.isnan(v) else f"{100.0 * v:5.1f}"
        lines.append(f"  {name:<{width}} {sv}")
    lines.append(f"mIoU: {100.0 * np.nanmean(iu):.2f}")
    lines.append(f"pixel acc: {100.0 * pixel_accuracy(hist):.2f}")
    return "\n".join(lines)
