"""Segmentation losses.

Counterpart of the reference's ``loss.py`` (SURVEY.md section 2):
``CrossEntropyLoss2d`` = log_softmax + 2-D NLL with ``ignore_index``. In JAX
the ignore-index semantics become a where-mask: ignored pixels contribute 0 to
the sum and are excluded from the normalizer — exactly torch's
``ignore_index`` + mean reduction.

Everything here is shape-static and fuses into the surrounding train step;
logits arrive fp32 (heads cast up) so log_softmax is numerically safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IGNORE_INDEX = 255


def at_least_f32(x: jnp.ndarray) -> jnp.ndarray:
    """Upcast bf16/f16 to float32 for stable loss math WITHOUT downcasting
    the float64 parity oracles (tests/test_trajectory_parity.py)."""
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))


def cross_entropy_2d(
    logits: jnp.ndarray,  # [B, H, W, C] float
    labels: jnp.ndarray,  # [B, H, W] int
    ignore_index: int = IGNORE_INDEX,
) -> jnp.ndarray:
    """Masked mean cross-entropy over valid pixels (torch CrossEntropyLoss2d
    with ignore_index parity)."""
    n_class = logits.shape[-1]
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0).astype(jnp.int32)
    logits = at_least_f32(logits)
    # CE = logsumexp(logits) - logits[label]. The target logit is picked with
    # a one-hot contraction, NOT take_along_axis: a per-pixel gather over the
    # class dim lowered to ~113 ms per call on v5e at 24x480x640x40 (profiled)
    # while the one-hot multiply+reduce fuses into the same pass as logsumexp.
    onehot = jax.nn.one_hot(safe_labels, n_class, dtype=logits.dtype)
    target_logit = jnp.sum(logits * onehot, axis=-1)
    lse = jax.nn.logsumexp(logits, axis=-1)
    nll = lse - target_logit
    nll = jnp.where(valid, nll, 0.0)
    denom = jnp.maximum(valid.sum(), 1)
    return nll.sum() / denom.astype(logits.dtype)


def boundary_targets_from_labels(
    labels: jnp.ndarray,  # [B, H, W] int
    ignore_index: int = IGNORE_INDEX,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Semantic-boundary ground truth derived on device from the label map.

    A pixel is a boundary pixel iff any 4-neighbor carries a *different,
    valid* class label (both sides of each class edge are marked). Pixels
    with ``ignore_index`` are excluded from supervision via the returned
    valid mask; edges against ignore regions are not boundaries (the true
    class behind the ignore pixel is unknown).

    This is the auxiliary boundary-detection target of the multitask fusion
    variant (SURVEY.md section 2 multitask row: "seg + auxiliary
    depth-estimation (and/or boundary) heads" [P arXiv:1812.04351]).
    Deriving it from the label map inside the jit'd step keeps the host
    pipeline untouched — no extra plane is decoded or shipped.

    Returns (targets float32 {0,1} [B,H,W], valid bool [B,H,W]).
    """
    lbl = labels.astype(jnp.int32)
    valid = labels != ignore_index
    boundary = jnp.zeros(labels.shape, bool)
    # vertical edges (compare row i with row i+1)
    edge_v = (lbl[:, 1:, :] != lbl[:, :-1, :]) & valid[:, 1:, :] & valid[:, :-1, :]
    boundary = boundary.at[:, 1:, :].set(edge_v)
    boundary = boundary.at[:, :-1, :].max(edge_v)
    # horizontal edges (compare col j with col j+1)
    edge_h = (lbl[:, :, 1:] != lbl[:, :, :-1]) & valid[:, :, 1:] & valid[:, :, :-1]
    boundary = boundary.at[:, :, 1:].max(edge_h)
    boundary = boundary.at[:, :, :-1].max(edge_h)
    return boundary.astype(jnp.float32), valid


def balanced_bce_2d(
    logits: jnp.ndarray,  # [B, H, W, 1] or [B, H, W] float
    targets: jnp.ndarray,  # [B, H, W] float {0,1}
    valid_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Class-balanced binary cross-entropy for boundary detection (HED-style:
    Xie & Tu 2015). Boundary pixels are ~2-5% of an image, so plain BCE
    collapses to all-negative; each class is reweighted by the other's
    frequency: w_pos = n_neg/n, w_neg = n_pos/n, computed over valid pixels.
    """
    if logits.ndim == targets.ndim + 1:
        logits = logits[..., 0]
    logits = at_least_f32(logits)
    targets = targets.astype(logits.dtype)
    if valid_mask is None:
        valid_mask = jnp.ones(targets.shape, bool)
    # weight math in the LOGITS dtype, not hardcoded fp32: under the fp64
    # test oracle these are cross-batch reductions, and an fp32 sum's
    # reassociation noise (~1e-7) between an n-shard psum and the 1-device
    # order would swamp the sharded-equality bound (production fp32 paths
    # are unchanged)
    validf = valid_mask.astype(logits.dtype)
    n_pos = (targets * validf).sum()
    n = jnp.maximum(validf.sum(), 1.0)
    beta = n_pos / n  # positive fraction
    w = jnp.where(targets > 0.5, 1.0 - beta, beta) * validf
    # numerically-stable BCE-with-logits: max(x,0) - x*t + log1p(exp(-|x|))
    bce = (jnp.maximum(logits, 0.0) - logits * targets
           + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    denom = jnp.maximum(w.sum(), 1e-6)
    return (w * bce).sum() / denom


def berhu_loss(
    pred: jnp.ndarray,  # [B, H, W, 1] predicted (log-)depth
    target: jnp.ndarray,  # [B, H, W] or [B, H, W, 1]
    valid_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Reverse-Huber (berHu) loss for the auxiliary depth-estimation task of
    the multitask fusion variant [P arXiv:1812.04351]. c = max|err|/5."""
    if target.ndim == pred.ndim - 1:
        target = target[..., None]
    err = pred - target
    if valid_mask is None:
        valid_mask = jnp.isfinite(target) & (target > 0)
    err = jnp.where(valid_mask, err, 0.0)
    abs_err = jnp.abs(err)
    c = jnp.maximum(abs_err.max() / 5.0, 1e-6)
    quad = (err * err + c * c) / (2.0 * c)
    loss = jnp.where(abs_err <= c, abs_err, quad)
    denom = jnp.maximum(valid_mask.sum(), 1)
    return loss.sum() / denom.astype(loss.dtype)
