"""Ahead-of-time serving export of the inference path.

The reference has no serving story (its L5 surface is training scripts —
SURVEY.md §1); production deployment of the rebuilt framework wants one. This
module packages the full inference pipeline — raw uint8 planes → on-device
preprocess (resize/normalize/HHA) → trunk → classifier(s) → native-resolution
argmax — as a **self-contained `jax.export` StableHLO artifact**: parameters
are baked in as constants, the graph is lowered for an explicit platform list
(TPU and/or CPU), and the artifact runs under any JAX ≥ the recorded
calling-convention version with zero framework code — `load_serving(path)`
is a convenience, not a requirement.

Why jax.export rather than a pickled apply-fn: the artifact is
runtime-portable (serialized StableHLO + calling convention, no Python
closures), versioned, and compiles on the serving host exactly as XLA sees
it here — the TPU-native answer to torchscript/ONNX export.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from mcseg_tpu.core.config import ExperimentConfig
from mcseg_tpu.models.factory import _dtype_of


def make_serve_fn(
    cfg: ExperimentConfig,
    params,
    batch_stats,
    average_classifiers: bool = True,
    out_shape: Optional[Tuple[int, int]] = None,
    with_probs: bool = False,
    with_depth: bool = False,
):
    """Build ``serve(batch) -> pred[, depth][, probs]`` with params closed
    over. ``with_depth`` (multitask checkpoints — a 'D' subtree in params)
    additionally returns the aux head's metric depth map [B,H,W] float32 —
    the full RGB-D product of the paper's multitask variant in one call.

    ``batch``: {'image': uint8 [B,h,w,3]} plus 'depth' (float32 meters or
    uint16-wire) when the checkpoint's input_ch needs HHA/depth channels —
    the same raw planes the training pipeline ships, so a serving client
    does no image math beyond decode.

    ``out_shape``: (H, W) of the returned prediction map; defaults to the
    checkpoint's test_img_shape. Predictions are int32 train ids; pass them
    through data.labels.get_submit_table for submission label spaces.

    Caveat (input_ch 1/4 only): the raw-depth channel is normalized by the
    per-BATCH depth max — the training/eval semantics, reproduced exactly —
    so multi-image requests couple each image's prediction to its batchmates.
    Export with ``batch=1`` for per-image determinism (the manifest repeats
    this note). input_ch 6 (HHA) has no such coupling.
    """
    from mcseg_tpu.eval.tester import make_infer_fn

    if out_shape is None:
        tw, th = cfg.data.test_img_shape
        out_shape = (th, tw)
    infer = make_infer_fn(cfg, average_classifiers, out_shape)
    d_head = None
    if with_depth:
        if "D" not in params:
            raise ValueError("with_depth needs a multitask checkpoint "
                             "(no 'D' depth-head subtree in params)")
        from mcseg_tpu.models.heads import DepthRegressor

        d_head = DepthRegressor(upsample=cfg.model.upsample,
                                dtype=_dtype_of(cfg.model))

    def serve(batch):
        if "image" not in batch:
            # ONLY depth-only checkpoints (input_ch=1) may omit the RGB
            # plane — there it is dead code in the graph (DCE'd). For any
            # RGB-consuming input_ch, fabricating zeros would silently
            # produce garbage predictions, so raise instead.
            if cfg.model.input_ch != 1:
                raise ValueError(
                    "serving batch needs an 'image' plane (the checkpoint's "
                    f"input_ch={cfg.model.input_ch} consumes RGB)")
            plane = batch.get("depth", batch.get("hha", batch.get("ir")))
            if plane is None:
                raise ValueError(
                    "depth-only serving batch needs a 'depth' (or 'hha'/"
                    "'ir') plane")
            batch = {**batch,
                     "image": jnp.zeros(plane.shape[:3] + (3,), jnp.uint8)}
        # eval preprocess wants a label plane; feed a dummy and drop it
        # (DCE'd from the exported graph — nothing consumes it)
        dummy = jnp.zeros(batch["image"].shape[:3], jnp.uint8)
        logits, _, feat = infer(params, batch_stats, {**batch, "label": dummy})
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        out = [pred]
        if d_head is not None:
            d = d_head.apply({"params": params["D"]}, feat, False)
            if d.shape[1:3] != pred.shape[1:3]:
                from mcseg_tpu.ops.upsample import upsample_matmul

                d = upsample_matmul(d, pred.shape[1], pred.shape[2], "resize")
            out.append(d[..., 0].astype(jnp.float32))
        if with_probs:
            out.append(jax.nn.softmax(logits, axis=-1))
        return out[0] if len(out) == 1 else tuple(out)

    return serve


def export_serving(
    cfg: ExperimentConfig,
    params,
    batch_stats,
    out_path: str,
    batch: int = 1,
    platforms: Sequence[str] = ("tpu", "cpu"),
    average_classifiers: bool = True,
    out_shape: Optional[Tuple[int, int]] = None,
    with_probs: bool = False,
    extra_plane: Optional[str] = None,
    with_depth: Optional[bool] = None,
) -> dict:
    """Export the inference path to ``out_path`` (+ a ``.json`` manifest).

    Returns the manifest dict. The artifact input is the raw-plane batch
    dict at the fixed ``batch`` size and the checkpoint's decode geometry
    (static shapes — the TPU serving contract; export several batch sizes
    for a bucketing server).

    ``extra_plane``: which non-RGB plane the artifact ingests when
    input_ch needs one — 'depth' (float32 meters), 'hha' (uint8 precomputed
    HHA, the reference's offline path), or 'ir' (uint8 multispectral, the
    input_ch=4 IR corpus). Default resolves from the checkpoint config:
    'hha' when input_ch=6 trained with precomputed HHA files
    (hha_on_device=False), 'ir' when the target corpus is the IR one, else
    'depth'. Must match training — the preprocess branch (HHA-encode vs /255
    scaling) follows the plane kind.
    """
    from jax import export as jax_export

    from mcseg_tpu.data.datasets import get_dataset

    # multitask checkpoints serve their aux depth map too by default —
    # the paper's RGB-D product in one artifact (with_depth=False opts out)
    if with_depth is None:
        with_depth = "D" in params
    serve = make_serve_fn(cfg, params, batch_stats, average_classifiers,
                          out_shape, with_probs, with_depth=with_depth)
    # input spec: the decode geometry of the checkpoint's target corpus —
    # but the corpus need not exist on the exporting host (checkpoints
    # embed the training host's data_root); fall back to test_img_shape
    ds = None
    if cfg.data.data_root:
        try:
            ds = get_dataset(cfg.data.tgt_dataset, cfg.data, "val")
        except (FileNotFoundError, ValueError, OSError):
            ds = None
    if ds is not None:
        w, h = ds.decode_size
    else:
        tw, th = cfg.data.test_img_shape
        w, h = tw, th
    if extra_plane is not None and extra_plane not in (
            "depth", "hha", "ir", "boundary"):
        raise ValueError(f"extra_plane must be 'depth'|'hha'|'ir'|'boundary', "
                         f"got {extra_plane!r}")
    plane_note = None
    spec = {}
    if cfg.model.input_ch != 1:
        spec["image"] = jax.ShapeDtypeStruct((batch, h, w, 3), jnp.uint8)
    if cfg.model.input_ch == 7:
        # rgb+hha+boundary: the boundary plane is always ingested; the HHA
        # source follows the same hha-vs-depth rule as input_ch=6
        spec["boundary"] = jax.ShapeDtypeStruct((batch, h, w), jnp.uint8)
        if extra_plane is None:
            extra_plane = "depth" if cfg.data.hha_on_device else "hha"
        if extra_plane == "depth":
            spec["depth"] = jax.ShapeDtypeStruct((batch, h, w), jnp.float32)
        elif extra_plane == "hha":
            spec["hha"] = jax.ShapeDtypeStruct((batch, h, w, 3), jnp.uint8)
        else:
            raise ValueError(
                "input_ch=7 takes extra_plane 'depth'|'hha' (the boundary "
                f"plane is implicit), got {extra_plane!r}")
    if cfg.model.input_ch in (1, 4, 6):
        if extra_plane == "ir" and cfg.model.input_ch == 6:
            raise ValueError(
                "extra_plane='ir' is only valid for input_ch 1/4 — the "
                "input_ch=6 preprocess consumes HHA or raw depth")
        if extra_plane == "boundary" and cfg.model.input_ch != 4:
            raise ValueError(
                "extra_plane='boundary' is only valid for input_ch 4 "
                "(rgb+boundary) or implicit in input_ch 7")
        if extra_plane is None:
            if cfg.model.input_ch == 6:
                extra_plane = ("depth" if cfg.data.hha_on_device else "hha")
            elif cfg.data.tgt_dataset.lower() == "ir":
                # the train preprocess prefers raw depth over IR when the
                # corpus carries both (ops/preprocess.py:_extra_channels);
                # introspect the corpus when it is reachable, else default
                # to depth and flag the ambiguity in the manifest
                samples = getattr(ds, "samples", None) if ds is not None else None
                if samples:
                    extra_plane = "depth" if "depth" in samples[0] else "ir"
                else:
                    extra_plane = "depth"
                    plane_note = (
                        "tgt corpus 'ir' was not reachable at export time; "
                        "defaulted to the raw-depth plane (the training "
                        "preference when depth exists) — pass "
                        "extra_plane='ir' if training consumed IR")
            else:
                # introspect the corpus for the plane the train preprocess
                # would consume (priority: depth > hha > ir > boundary,
                # ops/preprocess.py:_extra_channels); unreachable -> depth
                samples = getattr(ds, "samples", None) if ds is not None else None
                extra_plane = "depth"
                if samples:
                    for cand in ("depth", "hha", "ir", "boundary"):
                        if cand in samples[0]:
                            extra_plane = cand
                            break
        if extra_plane == "depth":
            spec["depth"] = jax.ShapeDtypeStruct((batch, h, w), jnp.float32)
        elif extra_plane == "hha":
            spec["hha"] = jax.ShapeDtypeStruct((batch, h, w, 3), jnp.uint8)
        else:  # 'ir' or 'boundary': single uint8 plane
            spec[extra_plane] = jax.ShapeDtypeStruct((batch, h, w), jnp.uint8)
    elif extra_plane is not None and cfg.model.input_ch == 3:
        raise ValueError(
            f"extra_plane={extra_plane!r} conflicts with "
            f"input_ch={cfg.model.input_ch} (RGB-only checkpoint)")
    exported = jax_export.export(jax.jit(serve), platforms=tuple(platforms))(
        spec)
    blob = exported.serialize()
    # tmp + os.replace (the utils/checkpoint.py atomicity contract): a crash
    # mid-export must never leave a truncated artifact or an artifact/manifest
    # pair that disagree
    with open(out_path + ".tmp", "wb") as f:
        f.write(blob)
    os.replace(out_path + ".tmp", out_path)
    manifest = {
        "format": "jax.export/stablehlo",
        "platforms": list(exported.platforms),
        "calling_convention_version": exported.calling_convention_version,
        "input_spec": {k: {"shape": list(v.shape), "dtype": str(v.dtype)}
                       for k, v in spec.items()},
        "output": "int32 train-id map [B,{},{}]".format(*(
            out_shape or (cfg.data.test_img_shape[1],
                          cfg.data.test_img_shape[0])))
        + (" + float32 depth meters" if with_depth else "")
        + (" + float32 softmax probs" if with_probs else ""),
        # ordered names of the artifact's outputs — hosts parse tuples by this
        "outputs": (["pred"] + (["depth"] if with_depth else [])
                    + (["probs"] if with_probs else [])),
        "n_class": cfg.model.n_class,
        "net": cfg.model.net,
        "input_ch": cfg.model.input_ch,
        "extra_plane": extra_plane,
        "average_classifiers": average_classifiers,
        "bytes": len(blob),
    }
    if extra_plane == "depth" and cfg.model.input_ch in (1, 4):
        manifest["note"] = (
            "raw-depth normalization uses the per-batch depth max (training "
            "semantics): multi-image batches couple predictions to their "
            "batchmates — export batch=1 for per-image determinism")
    if plane_note:
        manifest["plane_note"] = plane_note
    with open(out_path + ".json.tmp", "w") as f:
        json.dump(manifest, f, indent=2)
    os.replace(out_path + ".json.tmp", out_path + ".json")
    return manifest


def load_serving(path: str):
    """Deserialize an exported artifact; returns ``exported.call`` (jittable)."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return exported.call
