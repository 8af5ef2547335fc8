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
    """

    input_ch: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        x = x.astype(self.dtype)
        feats = []
        for si, (n_convs, ch) in enumerate(_VGG16_STAGES):
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
