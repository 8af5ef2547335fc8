"""Model factory — the TPU-native counterpart of the reference's
``models/model_util.get_models(net, input_ch, n_class, method, ...)``
(SURVEY.md section 2).

Returns the (G, F1, F2) module triple plus an ``init`` helper producing the
parameter/batch-stats pytrees. F2 is always constructed (the reference's
MCD method needs two classifiers; ``uses_one_classifier`` aliases F2:=F1 at
the train-step level, not here).

Also hosts ``widen_first_conv_params``: the reference widens a 3-channel
pretrained first conv to ``input_ch`` in {1,4,6} by copying the RGB slice —
we reproduce that as a pure pytree transform so torch-imported ImageNet
weights can seed multichannel trunks.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mcseg_tpu.core.config import ModelConfig
from mcseg_tpu.models.drn import build_drn, drn_variants
from mcseg_tpu.models.fcn_vgg import FCN8sClassifier, VGG16FeatureGenerator
from mcseg_tpu.models.fusion import LateFusionClassifier, LateFusionGenerator
from mcseg_tpu.models.heads import PixelClassifier


def _dtype_of(cfg: ModelConfig):
    # float64 exists only as a CPU test oracle (requires jax_enable_x64);
    # production dtypes are bfloat16 (TPU) and float32.
    table = {"bfloat16": jnp.bfloat16, "float64": jnp.float64}
    return table.get(cfg.dtype, jnp.float32)


def get_models(cfg: ModelConfig) -> Tuple[nn.Module, nn.Module, nn.Module]:
    """Build (G, F1, F2) linen modules for a ModelConfig."""
    dt = _dtype_of(cfg)
    if cfg.fusion == "late":
        if cfg.input_ch != 6:
            # LateFusionGenerator hard-splits channels [0:3] rgb / [3:6] hha;
            # any other input_ch would silently drop or misroute planes
            # (ADVICE r3 #3) — fail loudly instead.
            raise ValueError(
                f"--fusion late requires --input_ch 6 (rgb+hha), got "
                f"input_ch={cfg.input_ch}; use early fusion (single trunk) "
                "for other channel stacks")
        g = LateFusionGenerator(net=cfg.net, dtype=dt, s2d=cfg.s2d)
        f1 = LateFusionClassifier(cfg.n_class, upsample=cfg.upsample, dtype=dt)
        f2 = LateFusionClassifier(cfg.n_class, upsample=cfg.upsample, dtype=dt)
        return g, f1, f2
    if cfg.net in drn_variants():
        g = build_drn(cfg.net, input_ch=cfg.input_ch, dtype=dt, s2d=cfg.s2d)
        f1 = PixelClassifier(cfg.n_class, upsample=cfg.upsample, dtype=dt)
        f2 = PixelClassifier(cfg.n_class, upsample=cfg.upsample, dtype=dt)
        return g, f1, f2
    if cfg.net in ("psp", "psp_net", "pspnet"):
        from mcseg_tpu.models.psp_net import PSPFeatureGenerator

        g = PSPFeatureGenerator(input_ch=cfg.input_ch, dtype=dt)
        f1 = PixelClassifier(cfg.n_class, upsample=cfg.upsample, dtype=dt)
        f2 = PixelClassifier(cfg.n_class, upsample=cfg.upsample, dtype=dt)
        return g, f1, f2
    if cfg.net in ("fcn", "fcn8s", "fcn8s_vgg16"):
        from mcseg_tpu.ops.s2d import resolve_s2d

        # 'auto' resolves to OFF for the VGG trunk: packed stage-1 execution
        # is exact but measured a wash on v5e (351-366 vs 340 ms/step — the
        # stage is HBM/conv-FLOP-floor-bound, not MXU-arity-bound like the
        # DRN stem; see docs/ARCHITECTURE.md). Explicit --s2d on still
        # enables it for future geometries.
        vgg_s2d = False if cfg.s2d == "auto" else resolve_s2d(cfg.s2d)
        g = VGG16FeatureGenerator(input_ch=cfg.input_ch, dtype=dt,
                                  s2d=vgg_s2d)
        f1 = FCN8sClassifier(cfg.n_class, upsample=cfg.upsample, dtype=dt)
        f2 = FCN8sClassifier(cfg.n_class, upsample=cfg.upsample, dtype=dt)
        return g, f1, f2
    raise ValueError(f"unknown --net {cfg.net!r}")


def init_models(
    cfg: ModelConfig,
    rng: jax.Array,
    img_shape: Tuple[int, int] = (64, 64),
    batch: int = 1,
) -> Dict[str, Any]:
    """Initialize all variable collections.

    Returns {'params': {'G','F1','F2'}, 'batch_stats': {'G','F1','F2'}} with
    empty dicts where a collection doesn't exist (heads have no BN).
    Shapes: NHWC with H,W divisible by 8 (output-stride-8 trunks).
    """
    g, f1, f2 = get_models(cfg)
    h, w = img_shape
    kg, kf1, kf2 = jax.random.split(rng, 3)
    x = jnp.zeros((batch, h, w, cfg.input_ch), jnp.float32)
    gv = g.init({"params": kg}, x, False)
    # Size the heads with an abstract forward — no compile, no FLOPs (matters
    # for load_checkpoint, which builds this skeleton on every restore).
    feat_shape = jax.eval_shape(lambda v, xx: g.apply(v, xx, False), gv, x)
    feat = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), feat_shape)
    f1v = f1.init({"params": kf1}, feat, False)
    f2v = f2.init({"params": kf2}, feat, False)
    return {
        "params": {
            "G": gv["params"],
            "F1": f1v["params"],
            "F2": f2v["params"],
        },
        "batch_stats": {
            "G": gv.get("batch_stats", {}),
            "F1": f1v.get("batch_stats", {}),
            "F2": f2v.get("batch_stats", {}),
        },
    }


def widen_first_conv_params(kernel3: jnp.ndarray, input_ch: int) -> jnp.ndarray:
    """Widen an HWIO first-conv kernel from 3 input channels to ``input_ch``.

    Mirrors the reference's model_util behavior [SURVEY 2 [?]]: the RGB slice
    keeps the pretrained weights; extra channels (depth/HHA) are initialized
    with the channel-mean of the RGB kernel so initial activations have a
    similar scale. ``input_ch=1`` sums the RGB kernel (grayscale projection).
    """
    h, w, ci, co = kernel3.shape
    if ci != 3:
        raise ValueError(f"expected a 3-input-channel kernel, got {ci}")
    if input_ch == 3:
        return kernel3
    if input_ch == 1:
        return kernel3.sum(axis=2, keepdims=True)
    mean = kernel3.mean(axis=2, keepdims=True)
    extra = jnp.tile(mean, (1, 1, input_ch - 3, 1))
    return jnp.concatenate([kernel3, extra], axis=2)
