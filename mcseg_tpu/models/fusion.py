"""Late / score fusion of RGB and HHA branches.

The reference's third fusion mode (SURVEY.md section 2 + BASELINE config 5):
two parallel (G, F) stacks — one consuming RGB, one consuming HHA — fused by
*adding the class score maps*. Early fusion needs no module (it is just
``input_ch=6`` on a single trunk); this file provides the dual-branch wrappers
that keep the (G, F1, F2) contract so the MCD train step is fusion-agnostic.

TPU note: the two branches are independent convolution chains over the same
batch; XLA schedules them as one program, so on a single chip they simply fill
the MXU back-to-back — no special handling needed.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mcseg_tpu.models.drn import build_drn
from mcseg_tpu.models.heads import PixelClassifier


class LateFusionGenerator(nn.Module):
    """Two DRN trunks: input [B,H,W,6] -> (rgb_feat, hha_feat).

    Channels 0:3 are RGB, 3:6 are HHA (the stacking order of the reference's
    ``torch.cat([rgb, hha])`` — SURVEY.md section 3.4).
    """

    net: str = "drn_d_38"
    dtype: Any = jnp.float32
    s2d: str = "auto"

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        rgb, hha = x[..., 0:3], x[..., 3:6]
        f_rgb = build_drn(self.net, input_ch=3, dtype=self.dtype, s2d=self.s2d).copy(name="rgb_trunk")(rgb, train)
        f_hha = build_drn(self.net, input_ch=3, dtype=self.dtype, s2d=self.s2d).copy(name="hha_trunk")(hha, train)
        return f_rgb, f_hha


class LateFusionClassifier(nn.Module):
    """Score-fusion F network: classify each branch's features with its own
    1x1 head and sum the upsampled logits."""

    n_class: int
    upsample: str = "resize"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        f_rgb, f_hha = feats
        s_rgb = PixelClassifier(
            self.n_class, upsample=self.upsample, dtype=self.dtype, name="rgb_head"
        )(f_rgb, train)
        s_hha = PixelClassifier(
            self.n_class, upsample=self.upsample, dtype=self.dtype, name="hha_head"
        )(f_hha, train)
        return s_rgb + s_hha
