"""Pallas TPU kernel: fused uint8 -> normalized multichannel stack.

The memory-bound tail of the preprocessing pipeline (SURVEY.md section 3.4's
ToTensor/Normalize/cat): consume the uint8 RGB batch and the [0,1] extra
channels (HHA or depth), emit the normalized stacked training tensor in one
pass over HBM.

The per-sample horizontal flip happens OUTSIDE the kernel on the uint8 inputs
(1 byte/pixel — cheaper than flipping the f32 result, and Mosaic has no `rev`
lowering). Layout: one (batch, H-tile) block per program; W x C flatten onto
the vector lanes.

Falls back to interpret mode off-TPU so tests validate numerics on CPU.

MEASURED VERDICT (v5e, 24x480x640, input_ch=6): pallas 91.1 ms vs XLA 7.3 ms.
The C=6 minor dimension occupies 6 of 128 vector lanes per tile, so this
kernel wastes ~95% of the VPU; XLA's own elementwise fusion lays the data out
properly and is 12.5x faster. Production preprocessing therefore uses the
plain-XLA path (ops/preprocess.py) — per the TPU playbook: don't hand-schedule
what the compiler already does better. The kernel stays as a tested example +
baseline for future layout experiments (e.g. channel-planar batches).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcseg_tpu.data.transforms import HHA_MEAN, HHA_STD, RGB_MEAN, RGB_STD


def _build_mean_std(input_ch: int):
    if input_ch == 3:
        mean, std = RGB_MEAN, RGB_STD
    elif input_ch == 6:
        mean = np.concatenate([RGB_MEAN, HHA_MEAN])
        std = np.concatenate([RGB_STD, HHA_STD])
    elif input_ch == 4:
        mean = np.concatenate([RGB_MEAN, [0.5]])
        std = np.concatenate([RGB_STD, [0.25]])
    elif input_ch == 1:
        mean, std = np.array([0.5], np.float32), np.array([0.25], np.float32)
    else:
        raise ValueError(f"unsupported input_ch {input_ch}")
    return mean.astype(np.float32), std.astype(np.float32)


def _kernel(rgb_ref, extra_ref, out_ref, *, mean, std, input_ch, out_dtype):
    # Mosaic has no direct u8->f32 cast; widen through int32 first.
    rgb01 = rgb_ref[0].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
    if input_ch == 3:
        x = rgb01
    elif input_ch == 1:
        x = extra_ref[0]
    else:
        x = jnp.concatenate([rgb01, extra_ref[0]], axis=-1)
    # mean/std are python tuples -> folded into per-channel scalar VPU ops
    # (a captured traced array would be rejected by pallas_call)
    x = jnp.stack(
        [(x[..., c] - mean[c]) * (1.0 / std[c]) for c in range(input_ch)],
        axis=-1,
    )
    out_ref[0] = x.astype(out_dtype)


def _no_extra_adapter(kern, rgb_ref, out_ref, **kw):
    return kern(rgb_ref, None, out_ref, **kw)


def _flip_u8(x, flip):
    if x is None:
        return None
    mask = (flip > 0).reshape((-1,) + (1,) * (x.ndim - 1))
    return jnp.where(mask, x[:, :, ::-1], x)


@functools.partial(jax.jit, static_argnames=("input_ch", "out_dtype", "interpret"))
def fused_normalize_stack(
    rgb_u8: jnp.ndarray,  # [B, H, W, 3] uint8
    extra01: Optional[jnp.ndarray],  # [B, H, W, E] float32 in [0,1] or None
    flip: jnp.ndarray,  # [B] int32 (0/1)
    input_ch: int = 3,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, w, _ = rgb_u8.shape
    mean, std = _build_mean_std(input_ch)
    has_extra = extra01 is not None and extra01.shape[-1] > 0

    rgb_u8 = _flip_u8(rgb_u8, flip)
    if has_extra:
        extra01 = _flip_u8(extra01, flip)

    tile_h = 8 if h % 8 == 0 else h
    grid = (b, h // tile_h)

    kern = functools.partial(
        _kernel,
        mean=tuple(float(v) for v in mean),
        std=tuple(float(v) for v in std),
        input_ch=input_ch,
        out_dtype=out_dtype,
    )
    if not has_extra:
        kern = functools.partial(_no_extra_adapter, kern)

    def _block(c):
        return pl.BlockSpec(
            (1, tile_h, w, c),
            lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        )

    in_specs = [_block(3)]
    operands = [rgb_u8]
    if has_extra:
        in_specs.append(_block(extra01.shape[-1]))
        operands.append(extra01)

    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=_block(input_ch),
        out_shape=jax.ShapeDtypeStruct((b, h, w, input_ch), out_dtype),
        interpret=interpret,
    )(*operands)


def reference_normalize_stack(rgb_u8, extra01, flip, input_ch=3, out_dtype=jnp.float32):
    """Plain-XLA oracle with identical semantics (used in tests + as the
    production path where it profiles equal or better)."""
    mean, std = _build_mean_std(input_ch)
    rgb01 = rgb_u8.astype(jnp.float32) / 255.0
    if input_ch == 3:
        x = rgb01
    elif input_ch == 1:
        x = extra01
    else:
        x = jnp.concatenate([rgb01, extra01], axis=-1)
    x = (x - mean) / std
    fmask = (flip > 0)[:, None, None, None]
    x = jnp.where(fmask, x[:, :, ::-1, :], x)
    return x.astype(out_dtype)
