"""FCN8s (VGG16) alternative backbone — the reference's ``--net fcn`` option
(SURVEY.md section 2, ``models/fcn.py`` [?], inherited from MCD_DA).

G/F split: G is the VGG16 conv trunk returning the three skip features
(pool3 /8, pool4 /16, conv7 /32); F scores each, fuses coarse-to-fine with 2x
bilinear upsamples, and upsamples 8x to full resolution — the standard FCN8s
decoder (Long et al.), built NHWC with resize-based upsampling.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mcseg_tpu.models.heads import upsample_logits

# VGG16: (num_convs, channels) per stage
_VGG16_STAGES = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))


class VGG16FeatureGenerator(nn.Module):
    """VGG16 conv trunk + FCN's conv6/conv7 (fc-as-conv) layers.

    Returns (pool3, pool4, drop7) at strides 8/16/32.

    ``s2d``: run stage 1 (the two full-resolution 64-channel convs) in the
    space-to-depth packed domain (ops/s2d.py) — profiled at ~2% MXU
    efficiency unpacked on v5e (64-deep contraction + layout padding at
    640x480). Pack (1,2) makes them 128-channel at half width (full MXU
    contraction arity at only 2x the conv FLOPs), and pool1 *consumes* the
    pack's W direction: each 2x2/stride-2 pool window's W pair is exactly
    the (1,2) pack offset, so that half of the pool is an elementwise max
    over the 2 offset channel groups; the H pair is a row-pair max after a
    free major-dim reshape — no select-and-scatter either way. Same
    parameters, same function (float reduction order aside); exactness is
    tested in tests/test_s2d.py against a float64 oracle.
    """

    input_ch: int = 3
    dtype: Any = jnp.float32
    s2d: bool = False

    def _use_s2d(self, x) -> bool:
        return bool(self.s2d) and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        from mcseg_tpu.ops import s2d as _s2d  # local import: avoid cycle

        x = x.astype(self.dtype)
        feats = []
        if self._use_s2d(x):
            # pack (1,2): 128-deep contractions (full MXU arity) at only 2x
            # the original conv FLOPs — the (2,2) pack's 3x3 packed taps
            # quadruple them, which measured as a wash on v5e.
            xp = _s2d.space_to_depth(x, 1, 2)
            for ci in range(_VGG16_STAGES[0][0]):
                xp = _s2d.PackedConv(
                    64, 3, 1, in_pack=(1, 2), out_pack=(1, 2), use_bias=True,
                    kernel_init=nn.linear.default_kernel_init,
                    dtype=self.dtype, name=f"conv1_{ci + 1}")(xp)
                xp = nn.relu(xp)
            # pool1: the W direction of each 2x2 window is the pack offset
            # (channel-group max); the H direction is a row-pair max after a
            # free major-dim reshape. jnp.maximum's VJP is elementwise.
            c = 64
            xw = jnp.maximum(xp[..., 0 * c:1 * c], xp[..., 1 * c:2 * c])
            b, hh, ww, _ = xw.shape
            xw = xw.reshape(b, hh // 2, 2, ww, c)
            x = jnp.maximum(xw[:, :, 0], xw[:, :, 1])
            feats.append(x)
        stages = _VGG16_STAGES[len(feats):]
        for si, (n_convs, ch) in enumerate(stages, start=len(feats)):
            for ci in range(n_convs):
                x = nn.Conv(
                    ch, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name=f"conv{si + 1}_{ci + 1}",
                )(x)
                x = nn.relu(x)
            # SAME = ceil-mode pooling: odd extents keep their last row/col
            # (flax pads -inf, which never wins a max). At /32-divisible
            # sizes this is identical to valid pooling; at other sizes it is
            # what makes the skip fusion well-defined (see FCN8sClassifier).
            x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")
            feats.append(x)
        pool3, pool4, pool5 = feats[2], feats[3], feats[4]
        # conv6/conv7: FCN's convolutionalized fc layers (7x7 then 1x1).
        y = nn.Conv(4096, (7, 7), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv6")(pool5)
        y = nn.relu(y)
        y = nn.Dropout(0.5, deterministic=not train)(y)
        y = nn.Conv(4096, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv7")(y)
        y = nn.relu(y)
        y = nn.Dropout(0.5, deterministic=not train)(y)
        return pool3, pool4, y

    @property
    def out_dim(self) -> int:
        return 4096


class FCN8sClassifier(nn.Module):
    """FCN8s decoder head (an F network): score conv7/pool4/pool3, fuse with
    2x upsamples, then 8x to full resolution."""

    n_class: int
    upsample: str = "resize"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        del train
        pool3, pool4, conv7 = feats
        s7 = nn.Conv(self.n_class, (1, 1), dtype=self.dtype,
                     param_dtype=jnp.float32, name="score7")(conv7)
        s4 = nn.Conv(self.n_class, (1, 1), dtype=self.dtype,
                     param_dtype=jnp.float32, name="score4")(pool4)
        s3 = nn.Conv(self.n_class, (1, 1), dtype=self.dtype,
                     param_dtype=jnp.float32, name="score3")(pool3)
        s7 = s7.astype(jnp.float32)
        s4 = s4.astype(jnp.float32)
        s3 = s3.astype(jnp.float32)
        # With ceil-mode pooling a 2x upsample is >= the skip's extent; crop
        # to the skip before fusing (the reference FCN8s pads the input by
        # 100 px and crops the same way — at /32-divisible training shapes,
        # the BASELINE geometries, both crops are no-ops).
        def fuse(coarse, skip):
            up = upsample_logits(coarse, 2, self.upsample)
            return up[:, : skip.shape[1], : skip.shape[2]] + skip

        x = fuse(s7, s4)  # /16
        x = fuse(x, s3)  # /8
        return upsample_logits(x, 8, self.upsample)  # /1
