"""Depth-estimation metrics for the multitask variant's auxiliary head:
RMSE, absolute-relative error, and delta<1.25 accuracy (the standard
monocular-depth triple)."""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def depth_metrics(
    pred: jnp.ndarray,  # [B, H, W, 1] or [B, H, W] predicted depth (same units as target)
    target: jnp.ndarray,  # [B, H, W]
    min_depth: float = 1e-3,
) -> Dict[str, jnp.ndarray]:
    if pred.ndim == target.ndim + 1:
        pred = pred[..., 0]
    valid = jnp.isfinite(target) & (target > min_depth)
    n = jnp.maximum(valid.sum(), 1).astype(jnp.float32)
    p = jnp.where(valid, pred, 1.0)
    t = jnp.where(valid, target, 1.0)
    err = jnp.where(valid, p - t, 0.0)
    rmse = jnp.sqrt((err**2).sum() / n)
    abs_rel = (jnp.where(valid, jnp.abs(err) / t, 0.0)).sum() / n
    ratio = _delta_ratio(p, t)
    d125 = (jnp.where(valid, ratio < 1.25, False)).sum() / n
    return {"rmse": rmse, "abs_rel": abs_rel, "delta_1.25": d125}


def _delta_ratio(p: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """max(p/t, t/p) with non-positive predictions scored as failures.

    An unconstrained regression head can emit p <= 0 (common early in
    training); then p/t < 0 AND t/p <= 0, so the naive max is < 1.25 and a
    grossly wrong pixel would count as delta-accurate. t is already > 0 on
    valid pixels."""
    return jnp.where(p > 0, jnp.maximum(p / t, t / p), jnp.inf)


def depth_metric_sums(
    pred: jnp.ndarray, target: jnp.ndarray, min_depth: float = 1e-3
) -> Dict[str, jnp.ndarray]:
    """Valid-pixel-weighted running sums for multi-batch accumulation
    (finalize with ``finalize_depth_metrics``) — averaging per-batch means
    would weight small tail batches wrongly."""
    if pred.ndim == target.ndim + 1:
        pred = pred[..., 0]
    valid = jnp.isfinite(target) & (target > min_depth)
    p = jnp.where(valid, pred, 1.0)
    t = jnp.where(valid, target, 1.0)
    err = jnp.where(valid, p - t, 0.0)
    ratio = _delta_ratio(p, t)
    return {
        "n": valid.sum().astype(jnp.float32),
        "sse": (err**2).sum(),
        "sabs_rel": jnp.where(valid, jnp.abs(err) / t, 0.0).sum(),
        "sdelta": jnp.where(valid, ratio < 1.25, False).sum().astype(jnp.float32),
    }


def finalize_depth_metrics(sums: Dict[str, float]) -> Dict[str, float]:
    import numpy as np

    n = max(float(sums["n"]), 1.0)
    return {
        "rmse": float(np.sqrt(float(sums["sse"]) / n)),
        "abs_rel": float(sums["sabs_rel"]) / n,
        "delta_1.25": float(sums["sdelta"]) / n,
    }
