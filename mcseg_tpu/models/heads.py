"""Pixel-classifier heads (the "F" networks) and upsampling.

The reference splits every network into a feature generator G and pixel
classifiers F1/F2 (SURVEY.md section 2, ``models/dilated_fcn.py``): F is a 1x1
conv to ``n_class`` at output-stride 8 followed by a fixed-weight bilinear 8x
transposed conv (``fill_up_weights`` init).

TPU-native approach: do the 1x1 conv (an MXU matmul over the channel dim) at
the /8 resolution and upsample the *logits* with ``jax.image.resize`` — XLA
lowers this to efficient gathers/adds, and no transposed-conv scatter is
needed. A ``'convt'`` mode reproduces the reference's exact fixed-bilinear
transposed conv (as lhs-dilated depthwise conv) for bit-parity tests.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def bilinear_kernel(kernel_size: int, dtype=np.float32) -> np.ndarray:
    """Fixed 2-D bilinear interpolation kernel, the classic FCN
    ``fill_up_weights`` construction (one [k,k] tap pattern)."""
    f = int(np.ceil(kernel_size / 2.0))
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    og = np.ogrid[:kernel_size, :kernel_size]
    k = (1 - np.abs(og[0] / f - c)) * (1 - np.abs(og[1] / f - c))
    return k.astype(dtype)


def upsample_bilinear_convt(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Depthwise fixed-bilinear transposed conv, NHWC.

    Matches torch ``ConvTranspose2d(C, C, k=2*factor, stride=factor,
    padding=factor//2, groups=C, bias=False)`` with fill_up_weights — the
    reference decoder. Implemented as an lhs-dilated conv so XLA fuses it.
    """
    c = x.shape[-1]
    k = 2 * factor
    pad = factor // 2
    kern = jnp.asarray(bilinear_kernel(k), dtype=x.dtype)
    # Depthwise: HWIO with I=1, O=C, feature_group_count=C.
    kern = jnp.tile(kern[:, :, None, None], (1, 1, 1, c))
    lo = k - 1 - pad  # transposed-conv padding identity
    return jax.lax.conv_general_dilated(
        x,
        kern,
        window_strides=(1, 1),
        padding=((lo, lo), (lo, lo)),
        lhs_dilation=(factor, factor),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def upsample_logits(x: jnp.ndarray, factor: int, mode: str = "resize") -> jnp.ndarray:
    """8x (or any) logits upsample, as separable MXU matmuls (ops/upsample.py).

    Both modes are numerically exact matches of their references:
    ``resize`` == jax.image.resize bilinear, ``convt`` == the reference's
    fixed-bilinear ConvTranspose2d. The matmul formulation exists because
    XLA's VJP of jax.image.resize is a ~50 ms scatter on v5e at 640x480 —
    inside the MCD step (differentiated ~14x/iteration) that dominated
    everything; the matmul transpose costs ~2 ms.
    """
    if factor == 1:
        return x
    if mode not in ("resize", "convt"):
        raise ValueError(f"unknown upsample mode {mode!r}")
    from mcseg_tpu.ops.upsample import upsample_matmul

    b, h, w, c = x.shape
    return upsample_matmul(x, h * factor, w * factor, mode, out_dtype=x.dtype)


class PixelClassifier(nn.Module):
    """F-network for DRN trunks: 1x1 conv to n_class + 8x bilinear upsample.

    The 1x1 conv runs in ``dtype`` (bf16 on TPU -> a pure MXU matmul over the
    512-channel feature dim); logits are upsampled and returned in fp32 so the
    softmax/CE that follows is numerically safe.
    """

    n_class: int
    up_factor: int = 8
    upsample: str = "resize"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, train: bool = False):
        del train  # no BN/dropout in the DRN head
        x = nn.Conv(
            self.n_class,
            kernel_size=(1, 1),
            use_bias=True,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="score",
        )(feat)
        # upsample in compute dtype (bf16 matmuls with fp32 accumulation),
        # hand fp32 logits to the loss (bf16 logits end-to-end measured only
        # ~2% faster — not worth the softmax numerics drift)
        x = upsample_logits(x, self.up_factor, self.upsample)
        # at-least-fp32 logits for the loss (bf16 in -> fp32 out, measured
        # only ~2% faster end-to-end in bf16 — not worth the softmax drift);
        # never downcasts the float64 parity oracle
        return x.astype(jnp.promote_types(x.dtype, jnp.float32))


class BoundaryDetector(nn.Module):
    """Auxiliary boundary-detection head for the multitask fusion variant
    (SURVEY.md section 2, multitask trainer row: "(and/or boundary) heads"
    [P arXiv:1812.04351]): 1x1 conv to 1 logit channel + upsample. Trained
    with class-balanced BCE (losses/seg.py:balanced_bce_2d) against targets
    derived on device from the label map (boundary_targets_from_labels)."""

    up_factor: int = 8
    upsample: str = "resize"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, train: bool = False):
        del train
        x = nn.Conv(
            1,
            kernel_size=(1, 1),
            use_bias=True,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="boundary",
        )(feat)
        x = upsample_logits(x, self.up_factor, self.upsample)
        return x.astype(jnp.promote_types(x.dtype, jnp.float32))


class DepthRegressor(nn.Module):
    """Auxiliary depth-estimation head for the multitask fusion variant
    (SURVEY.md section 2, multitask trainer [P]): 1x1 conv to 1 channel +
    upsample, regressing depth in meters (berHu loss, train/multitask.py)."""

    up_factor: int = 8
    upsample: str = "resize"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, train: bool = False):
        del train
        x = nn.Conv(
            1,
            kernel_size=(1, 1),
            use_bias=True,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="depth",
        )(feat)
        x = upsample_logits(x, self.up_factor, self.upsample)
        return x.astype(jnp.promote_types(x.dtype, jnp.float32))
