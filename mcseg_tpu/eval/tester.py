"""Evaluation loop — counterpart of the reference's source_tester.py /
adapt_tester.py (SURVEY.md sections 3.3, 3.5).

Flow per batch (all on device, one jit program): eval preprocess -> G ->
F1 (and F2, averaged, for adapted checkpoints) -> bilinear resize of logits to
the native label resolution -> argmax -> fast-hist accumulation. Only the
final [n,n] confusion matrix and (optionally) predictions for PNG dumps reach
the host. The model is rebuilt from the config embedded in the checkpoint —
the reference's args->get_models round-trip.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mcseg_tpu.core.config import ExperimentConfig
from mcseg_tpu.data.datasets import get_dataset
from mcseg_tpu.data.labels import get_label_spec
from mcseg_tpu.eval.metrics import fast_hist, format_iou_table, miou_from_hist
from mcseg_tpu.models.factory import _dtype_of, get_models
from mcseg_tpu.ops.preprocess import make_eval_preprocess
from mcseg_tpu.train.apply import apply_classifier, apply_generator
from mcseg_tpu.utils.util import mkdir_if_not_exist


def _averaged_head_params(f1, params1, f2, params2):
    """Parameters of the single head equivalent to 0.5*(F1(feat)+F2(feat)).

    The adapted-checkpoint eval protocol averages the two classifiers'
    LOGITS (SURVEY.md section 3.3). When both heads are plain
    PixelClassifiers of identical geometry, every op in the head — the 1x1
    score conv, its bias add, and the fixed bilinear upsample — is linear,
    so averaging the outputs equals ONE head application with averaged
    kernel/bias: half the score convs, half the full-resolution logits
    upsamples and fp32 materializations per eval/serving batch (measured
    A/B on one v5e chip, DRN-D-38 RGB+HHA 640x480 batch 24 serving graph:
    463 -> 485 img/s/chip forward-only, tools/bench_serving.py). Averaging
    happens in fp32 param space (before the bf16 compute cast), exact to
    fp64 oracle within 1e-12 (tests/test_tester.py). Returns None when the
    heads are not poolable (late fusion, FCN8s skip decoders) — callers
    fall back to the two-apply form."""
    from mcseg_tpu.models.heads import PixelClassifier

    if not (
        isinstance(f1, PixelClassifier)
        and isinstance(f2, PixelClassifier)
        and (f1.n_class, f1.up_factor, f1.upsample, f1.dtype)
        == (f2.n_class, f2.up_factor, f2.upsample, f2.dtype)
    ):
        return None
    def avg(a, b):
        # Sum in the promoted (param x compute) dtype: under an fp64
        # compute oracle the fp32-stored params average exactly; under
        # bf16/fp32 production compute this is plain fp32 param space.
        dt = jnp.promote_types(jnp.asarray(a).dtype, f1.dtype)
        return 0.5 * (jnp.asarray(a, dt) + jnp.asarray(b, dt))

    return {
        "score": {
            "kernel": avg(params1["score"]["kernel"],
                          params2["score"]["kernel"]),
            "bias": avg(params1["score"]["bias"], params2["score"]["bias"]),
        }
    }


def make_infer_fn(cfg: ExperimentConfig, average_classifiers: bool = True,
                  out_shape=None):
    """The shared inference core: raw batch -> class logits.

    ``infer(params, batch_stats, raw_batch) -> (logits, label, feat)`` runs
    preprocess -> G -> F1 (averaged with F2 when ``average_classifiers``) ->
    bilinear logits upsample to ``out_shape`` ((H, W); defaults to the
    batch's label resolution — the eval protocol). Both the tester
    (make_eval_step) and the serving export (eval/serving.py) wrap THIS
    function, so the inference path cannot drift between them."""
    g, f1, f2 = get_models(cfg.model)
    pp = make_eval_preprocess(cfg.data)

    def infer(params, batch_stats, raw_batch):
        img, label = pp(raw_batch)
        feat, _ = apply_generator(g, params["G"], batch_stats["G"], img, False)
        if average_classifiers:
            avg = _averaged_head_params(f1, params["F1"], f2, params["F2"])
        else:
            avg = None
        if avg is not None:
            logits = apply_classifier(f1, avg, feat, False)
        elif average_classifiers:
            logits = apply_classifier(f1, params["F1"], feat, False)
            logits2 = apply_classifier(f2, params["F2"], feat, False)
            logits = 0.5 * (logits + logits2)
        else:
            logits = apply_classifier(f1, params["F1"], feat, False)
        oh, ow = out_shape if out_shape is not None else label.shape[1:3]
        if (oh, ow) != logits.shape[1:3]:
            from mcseg_tpu.ops.upsample import upsample_matmul

            logits = upsample_matmul(logits, oh, ow, "resize")
        return logits, label, feat

    return infer


def boundary_match_sums(b_logits, label, tol: int = 2):
    """Boundary-head scoring sums against label-derived edges.

    Strict per-pixel tp/fp/fn at the 0.5 threshold, PLUS distance-tolerant
    match sums at radius ``tol`` px (the BSDS/BF-score convention: a predicted
    boundary pixel counts if a true edge lies within the radius, and a true
    edge counts as found if a prediction lies within the radius). Strict
    boundary P/R is near-meaningless at a 1-px phase offset — every standard
    boundary benchmark scores with a tolerance — so the tolerant numbers are
    the comparable ones."""
    from mcseg_tpu.losses.seg import boundary_targets_from_labels

    tgt, valid = boundary_targets_from_labels(label)
    hit = (b_logits[..., 0] > 0.0) & valid  # sigmoid(x)>0.5 <=> x>0
    pos = (tgt > 0.5) & valid

    def dilate(mask):  # morphological dilation by tol px
        k = 2 * tol + 1
        return jax.lax.reduce_window(
            mask.astype(jnp.float32), -jnp.inf, jax.lax.max,
            window_dimensions=(1, k, k), window_strides=(1, 1, 1),
            padding="SAME") > 0

    return {
        "tp": (hit & pos).sum(), "fp": (hit & ~pos).sum(),
        "fn": (~hit & pos).sum(),
        # tolerant sums: pred pixels with a true edge within the radius
        # (precision numerator) and true-edge pixels with a prediction
        # within the radius (recall numerator)
        "tp_tol_p": (hit & dilate(pos)).sum(), "n_pred": hit.sum(),
        "tp_tol_r": (pos & dilate(hit)).sum(), "n_gt": pos.sum(),
    }


def make_eval_step(cfg: ExperimentConfig, average_classifiers: bool = True,
                   return_probs: bool = False, with_depth: bool = False,
                   with_boundary: bool = False, boundary_tol: int = 2):
    """Build the jit'd (params, batch_stats, raw_batch) -> (hist, preds[, probs])
    step. ``return_probs`` adds the softmax probability maps (the reference's
    --saves_prob option, SURVEY.md section 3.3). ``with_depth`` additionally
    evaluates the multitask depth head (params['D']) against the raw depth in
    the batch, returning valid-pixel-weighted metric sums. ``with_boundary``
    evaluates the boundary head (params['B']) against label-derived edges,
    returning tp/fp/fn sums at the 0.5 threshold PLUS distance-tolerant
    match sums at radius ``boundary_tol`` px (the BSDS/BF-score convention:
    a predicted boundary pixel counts if a true edge lies within the radius,
    and vice versa — strict per-pixel boundary P/R is near-meaningless at a
    1-px phase offset, so every standard boundary benchmark scores with a
    tolerance)."""
    infer = make_infer_fn(cfg, average_classifiers)
    n_class = cfg.model.n_class
    d_head = None
    if with_depth:
        from mcseg_tpu.models.heads import DepthRegressor

        d_head = DepthRegressor(upsample=cfg.model.upsample,
                                dtype=_dtype_of(cfg.model))
    b_head = None
    if with_boundary:
        from mcseg_tpu.models.heads import BoundaryDetector

        b_head = BoundaryDetector(upsample=cfg.model.upsample,
                                  dtype=_dtype_of(cfg.model))

    @jax.jit
    def eval_step(params, batch_stats, raw_batch):
        logits, label, feat = infer(params, batch_stats, raw_batch)
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        hist = fast_hist(label, pred, n_class)
        out = [hist, pred]
        if return_probs:
            out.append(jax.nn.softmax(logits, axis=-1))
        if d_head is not None:
            from mcseg_tpu.eval.depth_metrics import depth_metric_sums
            from mcseg_tpu.ops.preprocess import depth_to_meters

            d_pred = d_head.apply({"params": params["D"]}, feat, False)
            gt = depth_to_meters(raw_batch["depth"])
            if gt.shape[1:3] != d_pred.shape[1:3]:
                from mcseg_tpu.ops.upsample import upsample_matmul

                d_pred = upsample_matmul(d_pred, gt.shape[1], gt.shape[2], "resize")
            out.append(depth_metric_sums(d_pred, gt))
        if b_head is not None:
            b_logits = b_head.apply({"params": params["B"]}, feat, False)
            if label.shape[1:3] != b_logits.shape[1:3]:
                from mcseg_tpu.ops.upsample import upsample_matmul

                b_logits = upsample_matmul(b_logits, label.shape[1],
                                           label.shape[2], "resize")
            out.append(boundary_match_sums(b_logits, label, boundary_tol))
        return tuple(out)

    # The result tuple's layout depends on these flags; evaluate() reads them
    # off a PREBUILT step (the --eval_every_epochs cached-step path) instead
    # of re-inferring from params — a mismatch would misparse the tuple.
    eval_step.flags = {"return_probs": return_probs, "with_depth": with_depth,
                       "with_boundary": with_boundary,
                       "boundary_tol": boundary_tol}
    return eval_step


def evaluate(
    state_or_params,
    cfg: ExperimentConfig,
    dataset=None,
    average_classifiers: bool = True,
    save_dir: Optional[str] = None,
    max_batches: Optional[int] = None,
    print_table: bool = True,
    saves_prob: bool = False,
    mesh=None,
    num_workers: Optional[int] = None,
    eval_step=None,
    submit_dir: Optional[str] = None,
):
    """Run evaluation; returns (miou, hist, table_str).

    ``mesh``: evaluate data-parallel over the given device mesh — params are
    replicated, the batch is sharded on 'data', and XLA all-reduces the
    per-shard fast-hist inside the jit'd step, so epoch-end eval uses every
    chip instead of stalling an n-chip training run on one. The confusion
    matrix is bit-identical to the single-device run (integer scatter-adds
    commute). Host decode uses a ``num_workers`` thread pool (defaults to
    cfg.data.num_workers).

    ``submit_dir``: additionally dump predictions in the corpus's official
    submission format — for Cityscapes, full-resolution labelIds PNGs (train
    ids remapped through the inverse of the training remap table) named after
    the source frames, ready for the evaluation server. Works on the
    unlabeled test split (labels decode as all-ignore; the IoU table is then
    meaningless but the dumps are exact)."""
    submit_table = None
    if submit_dir:
        from mcseg_tpu.data.labels import get_submit_table

        submit_table = get_submit_table(cfg.data.tgt_dataset)
        if submit_table is None:
            raise ValueError(
                f"no submission protocol for corpus {cfg.data.tgt_dataset!r} "
                "(only Cityscapes has an evaluation server)")
        mkdir_if_not_exist(submit_dir)
    if hasattr(state_or_params, "params"):
        params, batch_stats = state_or_params.params, state_or_params.batch_stats
    else:
        params, batch_stats = state_or_params
    dataset = dataset or get_dataset(cfg.data.tgt_dataset, cfg.data, "val")
    _, _, names, palette = get_label_spec(cfg.data.tgt_dataset)
    # Multitask checkpoints (a 'D' depth-head subtree) are depth-evaluated too,
    # when the eval corpus actually carries depth.
    with_depth = "D" in params and "depth" in dataset[0]
    # Boundary-head checkpoints are scored against label-derived edges.
    with_boundary = "B" in params
    # ``eval_step``: pass a prebuilt make_eval_step result to reuse its jit
    # cache across calls (the --eval_every_epochs hook evaluates every epoch;
    # a fresh closure per call would retrace each time). The step's result
    # tuple is parsed by ITS OWN flags — never by the params-inferred ones,
    # which could disagree with how the prebuilt step was constructed.
    step = eval_step or make_eval_step(
        cfg, average_classifiers, return_probs=saves_prob,
        with_depth=with_depth, with_boundary=with_boundary)
    saves_prob = step.flags["return_probs"]
    with_depth = step.flags["with_depth"]
    with_boundary = step.flags["with_boundary"]

    n_class = cfg.model.n_class
    # Per-batch [n,n] hists are int32 (one batch is ~1e7 pixels, far from
    # overflow) but the *total* over a big sweep is not: Cityscapes
    # full-protocol val is ~1.05e9 pixels, within ~2x of int32 in the
    # diagonal-dominant cells. Device hists are collected lazily (dispatch
    # stays async) and summed host-side in int64 at the end.
    batch_hists = []
    depth_sums = {"n": 0.0, "sse": 0.0, "sabs_rel": 0.0, "sdelta": 0.0}
    boundary_sums = {"tp": 0.0, "fp": 0.0, "fn": 0.0,
                     "tp_tol_p": 0.0, "n_pred": 0.0,
                     "tp_tol_r": 0.0, "n_gt": 0.0}
    bs = min(cfg.data.batch_size, len(dataset))
    if mesh is not None:
        from mcseg_tpu.parallel.mesh import replicate, shard_batch

        n_dev = mesh.devices.size
        bs = max(bs // n_dev, 1) * n_dev  # static shape divisible by the mesh
        params = replicate(mesh, params)
        batch_stats = replicate(mesh, batch_stats)
    if num_workers is None:
        num_workers = cfg.data.num_workers
    pool = None
    if num_workers and num_workers > 1:
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(num_workers, thread_name_prefix="mcseg-eval")

    def _padded_batches():
        """Full static-shape batches over ALL samples: the tail batch is
        padded with copies whose labels are set to ignore, so padding
        contributes nothing to the confusion matrix (the reference evaluates
        every test image; dropping the tail would skew mIoU)."""
        n = len(dataset)
        batched = getattr(dataset, "get_batch", None)
        for start in range(0, n, bs):
            idx = list(range(start, min(start + bs, n)))
            n_pad = bs - len(idx)
            if batched is not None:
                # whole-batch native decode; pad by repeating the last sample
                batch = batched(idx + [idx[-1]] * n_pad)
            else:
                if pool is not None:
                    samples = list(pool.map(dataset.__getitem__, idx))
                else:
                    samples = [dataset[i] for i in idx]
                samples += [samples[-1]] * n_pad
                batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
            if n_pad:
                batch["label"] = batch["label"].copy()
                batch["label"][len(idx):] = 255
                if with_depth and "depth" in batch:
                    batch["depth"] = batch["depth"].copy()
                    batch["depth"][len(idx):] = 0.0  # invalid -> masked
            yield batch, len(idx)

    for bi, (raw, n_real) in enumerate(_padded_batches()):
        if max_batches is not None and bi >= max_batches:
            break
        if mesh is not None:
            from mcseg_tpu.parallel.mesh import shard_batch

            raw = shard_batch(mesh, raw)
        res = step(params, batch_stats, raw)
        hist, pred = res[0], res[1]
        nxt = 2
        probs = None
        if saves_prob:
            probs, nxt = res[nxt], nxt + 1
        if with_depth:
            for k, v in res[nxt].items():
                depth_sums[k] += float(v)
            nxt += 1
        if with_boundary:
            for k, v in res[nxt].items():
                boundary_sums[k] += float(v)
            nxt += 1
        batch_hists.append(hist)
        if save_dir or submit_table is not None:
            from mcseg_tpu.data.transforms import save_color_png, save_label_png

            if save_dir:
                mkdir_if_not_exist(save_dir)
            pred_np = np.asarray(pred)
            sample_paths = getattr(dataset, "samples", None)
            for k in range(n_real):
                idx = bi * bs + k
                if save_dir:
                    save_label_png(pred_np[k], os.path.join(save_dir, f"{idx:06d}_label.png"))
                    save_color_png(pred_np[k], palette, os.path.join(save_dir, f"{idx:06d}_color.png"))
                    if probs is not None:
                        np.save(os.path.join(save_dir, f"{idx:06d}_prob.npy"),
                                np.asarray(probs[k], dtype=np.float16))
                if submit_table is not None:
                    # name after the source frame so the evaluation server's
                    # <city>_<seq>_<frame> matcher finds it
                    name = (os.path.basename(sample_paths[idx]["rgb"])
                            if sample_paths else f"{idx:06d}.png")
                    save_label_png(submit_table[pred_np[k]],
                                   os.path.join(submit_dir, name))

    if pool is not None:
        pool.shutdown(wait=False)
    total = np.zeros((n_class, n_class), np.int64)
    for h in batch_hists:
        total += np.asarray(jax.device_get(h), dtype=np.int64)
    table = format_iou_table(total, names[: n_class])
    if with_depth:
        from mcseg_tpu.eval.depth_metrics import finalize_depth_metrics

        dm = finalize_depth_metrics(depth_sums)
        table += (
            f"\ndepth: rmse={dm['rmse']:.4f} m  abs_rel={dm['abs_rel']:.4f}"
            f"  delta<1.25={dm['delta_1.25']:.4f}"
        )
    if with_boundary:
        tp, fp, fn = (boundary_sums[k] for k in ("tp", "fp", "fn"))
        prec = tp / max(tp + fp, 1.0)
        rec = tp / max(tp + fn, 1.0)
        f1_score = 2 * prec * rec / max(prec + rec, 1e-9)
        # tolerant (BF-score-style) P/R/F1 — the comparable numbers
        tol = step.flags.get("boundary_tol", 2)
        prec_t = boundary_sums["tp_tol_p"] / max(boundary_sums["n_pred"], 1.0)
        rec_t = boundary_sums["tp_tol_r"] / max(boundary_sums["n_gt"], 1.0)
        f1_t = 2 * prec_t * rec_t / max(prec_t + rec_t, 1e-9)
        table += (
            f"\nboundary (tol={tol}px): precision={prec_t:.4f}"
            f"  recall={rec_t:.4f}  f1={f1_t:.4f}"
            f"\nboundary (strict):  precision={prec:.4f}  recall={rec:.4f}"
            f"  f1={f1_score:.4f}"
        )
    if print_table:
        print(table)
    return miou_from_hist(total), total, table
