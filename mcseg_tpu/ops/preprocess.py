"""Fused on-device preprocessing.

The reference runs its per-sample hot path (SURVEY.md section 3.4) in forked
DataLoader CPU workers: PIL decode -> joint resize/crop/flip -> normalize ->
channel stack, then a pinned-memory H2D copy. The TPU-native design inverts
this: host workers ONLY decode files into fixed-size uint8/float raw batches;
everything else is ONE jit-compiled function executed on device, per shard,
fused by XLA with nothing but uint8 crossing PCIe:

  raw uint8 RGB [B,h0,w0,3] (+ float depth [B,h0,w0] | uint8 HHA)
      -> label remap (gather through the corpus table)
      -> depth->HHA encode (ops.hha) when input_ch needs it and no HHA given
      -> joint geometry: resize to pre-crop size, per-sample random crop +
         horizontal flip (bilinear for channels, nearest for labels, SAME
         crop/flip for both — the reference's shared-seed contract)
      -> per-channel normalize + multichannel stack

Randomness comes from a jax PRNG key threaded by the caller, so the whole
train iteration (preprocess + MCD step) is deterministic given (seed, step).
All shapes are static: the pre-crop size is ceil(target / crop_scale) fixed
at trace time.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mcseg_tpu.core.config import DataConfig
from mcseg_tpu.data.labels import get_label_spec
from mcseg_tpu.data.transforms import HHA_MEAN, HHA_STD, RGB_MEAN, RGB_STD
from mcseg_tpu.ops.hha import default_intrinsics, depth_to_hha_batch


def depth_to_meters(d: jnp.ndarray) -> jnp.ndarray:
    """Accept both depth wire formats: float32 meters (datasets' decode
    output) or uint16 millimeters (the compact wire encoding the pipeline
    uses to halve PCIe/ICI bytes — data/pipeline.py WIRE_DEPTH_U16)."""
    if d.dtype == jnp.uint16:
        return d.astype(jnp.float32) * 0.001
    return d.astype(jnp.float32)


def host_table(table) -> np.ndarray:
    """Coerce a remap table to HOST numpy, refusing device arrays.

    The table is a trace-time constant consumed by ``apply_remap``'s
    compile-time select chain (np.nonzero below), so it must live on the
    host. ``np.asarray`` on a committed jax.Array would silently issue a
    device->host fetch in the middle of tracing — on a tunneled TPU that
    fetch has been observed to stall for minutes (or hang outright), turning
    a 1 KB constant into an un-debuggable compile freeze. Fail fast instead."""
    if isinstance(table, jax.Array):
        raise TypeError(
            "remap_table must be host numpy (trace-time constant), got a "
            "device jax.Array — pass the table from get_label_spec() "
            "directly instead of jnp.asarray()-ing it")
    return np.asarray(table)


def apply_remap(label_u8: jnp.ndarray, table_np: np.ndarray) -> jnp.ndarray:
    """Label remap as a compare/select chain instead of a table gather.

    The 256-entry gather lowered to ~58 ms per batch on v5e at 24x480x640
    (profiled); a select per mapped class (19 for Cityscapes, 40 for NYU) is
    pure VPU and fuses with the surrounding preprocessing.
    """
    from mcseg_tpu.data.labels import IGNORE

    label = label_u8.astype(jnp.int32)
    out = jnp.full_like(label, IGNORE)
    for raw in np.nonzero(table_np != IGNORE)[0]:
        out = jnp.where(label == int(raw), int(table_np[raw]), out)
    return out


def _resize_bilinear(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, hw[0], hw[1], c), method="bilinear")


# ---- fused resize+crop as separable per-sample interpolation matmuls -------
#
# The train path's "resize to pre-crop canvas, then dynamic-slice a random
# window" is equivalent to sampling a shifted grid of the ORIGINAL image:
#   out[i] = interp(x, t(i)),  t(i) = (top + i + 0.5) * in/pre - 0.5
# Building the two-tap (bilinear) or one-tap (nearest) interpolation weights
# as per-sample [out, in] matrices turns the whole geometry into two batched
# matmuls that run on the MXU — jax.image.resize lowers to serial gather
# loops on TPU (~17 ms per 24x480x640x3 call, profiled) and the slice+copy
# disappears entirely. Upscale-only (pre >= in), where the triangle kernel is
# exactly two-tap, matching jax.image.resize(method='bilinear') semantics.


def _interp_matrix(out_size: int, in_size: int, pre_size: int,
                   offsets: jnp.ndarray, nearest: bool, dtype) -> jnp.ndarray:
    """[B, out_size, in_size] interpolation weights for t(i) above."""
    i = jnp.arange(out_size, dtype=jnp.float32)
    t = (offsets.astype(jnp.float32)[:, None] + i[None, :] + 0.5) * (
        in_size / pre_size
    ) - 0.5
    j = jnp.arange(in_size, dtype=jnp.float32)
    if nearest:
        # jax.image.resize 'nearest': index = floor((i+0.5) * in/out)
        idx = jnp.clip(jnp.floor(t + 0.5), 0, in_size - 1)
        w = (j[None, None, :] == idx[..., None]).astype(dtype)
        return w
    w = jnp.maximum(0.0, 1.0 - jnp.abs(t[..., None] - j[None, None, :]))
    # edge renormalization (scale_and_translate zeroes out-of-range taps)
    w = w / jnp.maximum(w.sum(-1, keepdims=True), 1e-8)
    return w.astype(dtype)


def _resize_crop_matmul(x: jnp.ndarray, pre: Tuple[int, int],
                        target: Tuple[int, int], tops: jnp.ndarray,
                        lefts: jnp.ndarray, nearest: bool = False) -> jnp.ndarray:
    """x [B, Hin, Win, C] -> [B, target_h, target_w, C]: resize-to-pre + crop
    fused into A_h @ x @ A_w^T with per-sample matrices."""
    b, hin, win, _ = x.shape
    dt = jnp.float32 if nearest else x.dtype
    a_h = _interp_matrix(target[0], hin, pre[0], tops, nearest, dt)
    a_w = _interp_matrix(target[1], win, pre[1], lefts, nearest, dt)
    # only two taps per row are nonzero: fp32 matmul here is exactly the
    # two-tap lerp (plus zeros), so force full precision for fp32 inputs
    prec = jax.lax.Precision.HIGHEST if dt == jnp.float32 else None
    y = jnp.einsum("bij,bjwc->biwc", a_h, x.astype(dt), precision=prec)
    return jnp.einsum("bwk,bikc->biwc", a_w, y, precision=prec)


def _resize_nearest_labels(lbl: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    b = lbl.shape[0]
    return jax.image.resize(lbl, (b, hw[0], hw[1]), method="nearest")


def _crop_one(img, top, left, ch, cw):
    return jax.lax.dynamic_slice(img, (top, left, 0), (ch, cw, img.shape[-1]))


def _normalize_stack(rgb01, extra, input_ch: int) -> jnp.ndarray:
    """rgb01 in [0,1]; extra = HHA in [0,1] (or depth01) or None."""
    dt = rgb01.dtype
    mean = jnp.asarray(RGB_MEAN, dt)
    std = jnp.asarray(RGB_STD, dt)
    rgb = (rgb01 - mean) / std
    if input_ch == 3:
        return rgb
    if input_ch == 6:
        hha = (extra - jnp.asarray(HHA_MEAN, dt)) / jnp.asarray(HHA_STD, dt)
        return jnp.concatenate([rgb, hha], axis=-1)
    if input_ch == 4:
        d = (extra - jnp.asarray(0.5, dt)) / jnp.asarray(0.25, dt)
        return jnp.concatenate([rgb, d], axis=-1)
    if input_ch == 1:
        return (extra - jnp.asarray(0.5, dt)) / jnp.asarray(0.25, dt)
    if input_ch == 7:  # rgb + hha + boundary edge map
        hha = (extra[..., :3] - jnp.asarray(HHA_MEAN, dt)) / jnp.asarray(HHA_STD, dt)
        bnd = (extra[..., 3:] - jnp.asarray(0.5, dt)) / jnp.asarray(0.25, dt)
        return jnp.concatenate([rgb, hha, bnd], axis=-1)
    raise ValueError(f"unsupported input_ch {input_ch}")


def _extra_channels(
    batch: Dict[str, jnp.ndarray], input_ch: int, hha_on_device: bool = False
) -> jnp.ndarray:
    """Non-RGB channels in [0,1]: HHA (input_ch 6) or scaled depth (1/4).

    ``hha_on_device`` picks the HHA source when both a precomputed 'hha'
    image (the reference's offline path) and raw 'depth' are in the batch:
    True encodes HHA on device from depth (the BASELINE scope extension),
    False prefers the precomputed files. With only one source present, the
    flag is moot — whatever exists is used.
    """
    has_hha = "hha" in batch and batch["hha"] is not None
    has_depth = "depth" in batch and batch["depth"] is not None
    has_boundary = "boundary" in batch and batch["boundary"] is not None
    if input_ch in (6, 7):
        hha = None
        if has_hha and not (hha_on_device and has_depth):
            hha = batch["hha"].astype(jnp.float32) / 255.0
        elif has_depth:
            depth = depth_to_meters(batch["depth"])
            hha = depth_to_hha_batch(
                depth, default_intrinsics(depth.shape[1], depth.shape[2])
            ) / 255.0
        if hha is not None and input_ch == 6:
            return hha
        if hha is not None and has_boundary:
            # boundary-as-input-channel (SURVEY.md section 2 '+boundary [?]'):
            # nonzero-edge map as a 7th channel next to RGB+HHA
            bnd = (batch["boundary"] > 0).astype(jnp.float32)[..., None]
            return jnp.concatenate([hha, bnd], axis=-1)
        if input_ch == 7:
            raise ValueError(
                "input_ch=7 needs 'boundary' plus 'hha'/'depth' in the batch")
    elif input_ch in (1, 4):
        if has_depth:
            depth = depth_to_meters(batch["depth"])
            dmax = jnp.maximum(jnp.max(depth), 1e-3)
            return (depth / dmax)[..., None]
        if has_hha:  # disparity channel as a 1-ch depth proxy
            return batch["hha"][..., 0:1].astype(jnp.float32) / 255.0
        if "ir" in batch and batch["ir"] is not None:  # multispectral 4th ch
            return batch["ir"].astype(jnp.float32)[..., None] / 255.0
        if has_boundary:  # edge map as the 4th channel (rgb+boundary)
            return (batch["boundary"] > 0).astype(jnp.float32)[..., None]
    raise ValueError(
        f"input_ch={input_ch} needs 'hha'/'depth'/'ir'/'boundary' in the batch")


def make_train_preprocess(
    cfg: DataConfig, with_depth: bool = False,
    compute_dtype=jnp.float32,
) -> Callable:
    """Build the jit-able train preprocess: (batch_dict, key) -> (img, label).

    batch_dict (host-stacked raw arrays):
      image  uint8  [B, h0, w0, 3]
      label  uint8  [B, h0, w0]            (raw corpus ids)
      depth  float32 meters | uint16 mm [B, h0, w0]  optional
      hha    uint8  [B, h0, w0, 3]         optional (precomputed, like the ref)

    Returns img [B, H, W, input_ch] in ``compute_dtype``, label int32
    [B, H, W]. ``with_depth=True`` appends a third output: the raw depth plane
    in METERS (always float32) carried through the SAME resize/crop/flip as
    image and label — the multitask variant's supervision target (keeping the
    aux task geometrically consistent with the segmentation crop).

    ``compute_dtype=bfloat16`` (pass the model's dtype) runs the image-plane
    geometry in bf16 — halves the HBM traffic of resize/crop/flip/normalize.
    Pixels are 8-bit-quantized sources, so bf16's ~0.4% rounding is below the
    data's own quantization; HHA encoding and label/depth planes stay exact.
    """
    tw, th = cfg.train_img_shape  # reference flag order (W, H)
    target = (th, tw)
    if cfg.random_crop:
        pre = (int(np.ceil(th / np.sqrt(cfg.crop_scale_min))),
               int(np.ceil(tw / np.sqrt(cfg.crop_scale_min))))
    else:
        pre = target
    _, remap_src_np, _, _ = get_label_spec(cfg.src_dataset)
    needs_hha = cfg.input_ch in (1, 4, 6, 7)

    def preprocess(batch: Dict[str, jnp.ndarray], key: jax.Array,
                   remap_table: Optional[np.ndarray] = None):
        table = remap_src_np if remap_table is None else host_table(remap_table)
        img_u8 = batch["image"]
        # Unlabeled (target-domain) batches may omit 'label' entirely — the
        # pipeline drops it from the wire since MCD never reads target labels.
        label_u8 = batch.get("label")
        b = img_u8.shape[0]

        rgb = img_u8.astype(compute_dtype) / 255.0
        label = apply_remap(label_u8, table) if label_u8 is not None else None

        extra = (_extra_channels(batch, cfg.input_ch, cfg.hha_on_device)
                 if needs_hha else None)
        if extra is not None:
            extra = extra.astype(compute_dtype)
        # The depth supervision plane interpolates in float64 WHEN x64 IS
        # ENABLED (the fp64 test oracles), rounding back to the float32 wire
        # contract: its [B,H,W,1] einsum is small enough that XLA CPU emits
        # different FMA groupings for different batch tilings, so pure-fp32
        # results differ in the last bit between an n-shard and a 1-device
        # executable — fp64 compute puts that noise ~8 decades below the
        # fp32 rounding step, making the rounded plane layout-invariant.
        # The explicit x64 check (rather than astype(float64)
        # unconditionally) avoids the "requested dtype float64 ... will be
        # truncated" warning on every production (x64-off) trace.
        dep_dtype = (jnp.float64 if jax.config.jax_enable_x64
                     else jnp.float32)
        dep = (depth_to_meters(batch["depth"]).astype(dep_dtype)[..., None]
               if with_depth else None)

        # ---- joint geometry ------------------------------------------------
        h0, w0 = img_u8.shape[1], img_u8.shape[2]
        # matmul path: resize+crop fused into per-sample MXU einsums. Valid
        # when the pre-crop canvas upscales the decode size (two-tap kernel ==
        # jax.image.resize); production train configs always upscale.
        use_matmul = (
            cfg.random_crop and pre != target
            and pre[0] >= h0 and pre[1] >= w0
        )
        if use_matmul:
            k_top, k_left, k_flip = jax.random.split(key, 3)
            tops = jax.random.randint(k_top, (b,), 0, pre[0] - target[0] + 1)
            lefts = jax.random.randint(k_left, (b,), 0, pre[1] - target[1] + 1)
            planes = rgb if extra is None else jnp.concatenate([rgb, extra], -1)
            planes = _resize_crop_matmul(planes, pre, target, tops, lefts)
            rgb, extra = (planes, None) if extra is None else (
                planes[..., :3], planes[..., 3:]
            )
            if label is not None:
                label = _resize_crop_matmul(
                    label[..., None].astype(jnp.float32), pre, target, tops,
                    lefts, nearest=True,
                )[..., 0].astype(jnp.int32)  # one-tap 0/1 weights: exact
            if dep is not None:
                dep = _resize_crop_matmul(dep, pre, target, tops, lefts)
        else:
            rgb = _resize_bilinear(rgb, pre)
            if label is not None:
                label = _resize_nearest_labels(label, pre)
            if extra is not None:
                extra = _resize_bilinear(extra, pre)
            if dep is not None:
                dep = _resize_bilinear(dep, pre)

            if cfg.random_crop and pre != target:
                k_top, k_left, k_flip = jax.random.split(key, 3)
                tops = jax.random.randint(k_top, (b,), 0, pre[0] - target[0] + 1)
                lefts = jax.random.randint(k_left, (b,), 0, pre[1] - target[1] + 1)
                crop = partial(_crop_one, ch=target[0], cw=target[1])
                rgb = jax.vmap(crop)(rgb, tops, lefts)
                if label is not None:
                    label = jax.vmap(crop)(label[..., None], tops, lefts)[..., 0]
                if extra is not None:
                    extra = jax.vmap(crop)(extra, tops, lefts)
                if dep is not None:
                    dep = jax.vmap(crop)(dep, tops, lefts)
            else:
                k_flip = key

        if cfg.random_flip:
            flip = jax.random.bernoulli(k_flip, 0.5, (b,))
            fmask = flip[:, None, None, None]
            rgb = jnp.where(fmask, rgb[:, :, ::-1, :], rgb)
            if label is not None:
                label = jnp.where(flip[:, None, None], label[:, :, ::-1], label)
            if extra is not None:
                extra = jnp.where(fmask, extra[:, :, ::-1, :], extra)
            if dep is not None:
                dep = jnp.where(fmask, dep[:, :, ::-1, :], dep)

        img = _normalize_stack(rgb, extra, cfg.input_ch)
        if with_depth:
            # back to the float32 wire contract (see the fp64 note above)
            return img, label, dep[..., 0].astype(jnp.float32)
        return img, label

    return preprocess


def make_eval_preprocess(cfg: DataConfig) -> Callable:
    """Deterministic eval preprocess: resize to test_img_shape + normalize.
    Labels are remapped but NOT resized — mIoU is computed at native label
    resolution against logits upsampled by the tester (reference behavior,
    SURVEY.md section 3.3)."""
    tw, th = cfg.test_img_shape
    target = (th, tw)
    _, remap_tbl_np, _, _ = get_label_spec(cfg.tgt_dataset)
    needs_hha = cfg.input_ch in (1, 4, 6, 7)

    def preprocess(batch: Dict[str, jnp.ndarray],
                   remap_table: Optional[np.ndarray] = None):
        table = remap_tbl_np if remap_table is None else host_table(remap_table)
        rgb = batch["image"].astype(jnp.float32) / 255.0
        label = apply_remap(batch["label"], table)
        extra = (_extra_channels(batch, cfg.input_ch, cfg.hha_on_device)
                 if needs_hha else None)
        rgb = _resize_bilinear(rgb, target)
        if extra is not None:
            extra = _resize_bilinear(extra, target)
        img = _normalize_stack(rgb, extra, cfg.input_ch)
        return img, label

    return preprocess
