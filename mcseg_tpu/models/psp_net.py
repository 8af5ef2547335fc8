"""PSPNet alternative backbone — the reference's ``--net psp`` option
inherited from upstream MCD_DA (SURVEY.md section 2, presence flagged [?]).

Architecture per *Pyramid Scene Parsing Network* (Zhao et al., CVPR 2017):
a dilated ResNet-50 trunk (output stride 8: stage4 dilation 2, stage5
dilation 4) followed by the Pyramid Pooling Module (adaptive average pools at
1/2/3/6 bins -> 1x1 conv -> bilinear upsample -> concat -> 3x3 conv fuse).

G/F split for MCD: G = trunk + PPM fusion (512-ch features at /8);
F = PixelClassifier (1x1 conv + 8x upsample), shared with the DRN family.
Built NHWC/bf16 from the paper description; reuses the Bottleneck block from
models/drn.py.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mcseg_tpu.models.drn import Bottleneck, ResStage, _bn, _conv


class PyramidPooling(nn.Module):
    """PPM: global context at multiple scales, fused back at /8."""

    bins: Sequence[int] = (1, 2, 3, 6)
    reduce_ch: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        outs = [x]
        per_bin = self.reduce_ch // len(self.bins)
        for bi, n_bins in enumerate(self.bins):
            # adaptive average pool to (n_bins, n_bins): exact when divisible,
            # otherwise resize-then-pool keeps shapes static
            if h % n_bins == 0 and w % n_bins == 0:
                ph, pw = h // n_bins, w // n_bins
                pooled = nn.avg_pool(x, (ph, pw), strides=(ph, pw))
            else:
                rh, rw = n_bins * (h // n_bins or 1), n_bins * (w // n_bins or 1)
                rs = jax.image.resize(x, (b, rh, rw, c), method="bilinear")
                pooled = nn.avg_pool(rs, (rh // n_bins, rw // n_bins),
                                     strides=(rh // n_bins, rw // n_bins))
            y = _conv(per_bin, 1, dtype=self.dtype, name=f"reduce{bi}")(pooled)
            y = _bn(train, dtype=self.dtype, name=f"reduce_bn{bi}")(y)
            y = nn.relu(y)
            y = jax.image.resize(y, (b, h, w, per_bin), method="bilinear")
            outs.append(y)
        y = jnp.concatenate(outs, axis=-1)
        y = _conv(self.reduce_ch, 3, dtype=self.dtype, name="fuse")(y)
        y = _bn(train, dtype=self.dtype, name="fuse_bn")(y)
        return nn.relu(y)


class PSPFeatureGenerator(nn.Module):
    """Dilated ResNet-50 trunk + PPM -> [B, H/8, W/8, 512]."""

    input_ch: int = 3
    dtype: Any = jnp.float32

    @property
    def out_dim(self) -> int:
        return 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        # stem: conv7 s2 + maxpool s2 -> /4
        x = _conv(64, 7, 2, dtype=self.dtype, name="conv0")(x)
        x = _bn(train, dtype=self.dtype, name="bn0")(x)
        x = nn.relu(x)
        # torch MaxPool2d(3, 2, padding=1) semantics: symmetric (1,1) padding
        # (with -inf fill), NOT 'SAME' (which pads (0,1) on even sizes and
        # shifts the grid by one pixel vs the torch reference)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        # ResNet-50 stages; dilation replaces stride in stages 4-5 -> /8
        x = ResStage(Bottleneck, 64, 3, stride=1, dtype=self.dtype, name="layer1")(x, train)
        x = ResStage(Bottleneck, 128, 4, stride=2, dtype=self.dtype, name="layer2")(x, train)
        x = ResStage(Bottleneck, 256, 6, stride=1, dilation=2, new_level=False,
                     dtype=self.dtype, name="layer3")(x, train)
        x = ResStage(Bottleneck, 512, 3, stride=1, dilation=4, new_level=False,
                     dtype=self.dtype, name="layer4")(x, train)
        return PyramidPooling(dtype=self.dtype, name="ppm")(x, train)
