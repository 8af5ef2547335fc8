"""Model zoo: shapes, output stride, variants, widening, upsample parity
vs torch's fixed-bilinear ConvTranspose2d (SURVEY.md section 4 'golden-model')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mcseg_tpu.core.config import ModelConfig
from mcseg_tpu.models.drn import build_drn, drn_variants
from mcseg_tpu.models.factory import get_models, init_models, widen_first_conv_params
from mcseg_tpu.models.heads import bilinear_kernel, upsample_bilinear_convt


def _fwd(cfg, hw=(16, 16), batch=1):
    variables = init_models(cfg, jax.random.key(0), img_shape=hw, batch=batch)
    g, f1, f2 = get_models(cfg)
    x = jnp.ones((batch, *hw, cfg.input_ch), jnp.float32)
    gvars = {"params": variables["params"]["G"]}
    if variables["batch_stats"]["G"]:
        gvars["batch_stats"] = variables["batch_stats"]["G"]
    feat = g.apply(gvars, x, False)
    o = f1.apply({"params": variables["params"]["F1"]}, feat, False)
    return feat, o


def test_drn_d_22_output_stride_8_and_logits_fullres():
    cfg = ModelConfig(net="drn_d_22", input_ch=3, n_class=12, dtype="float32")
    feat, logits = _fwd(cfg, hw=(16, 24))
    assert feat.shape == (1, 2, 3, 512)
    assert logits.shape == (1, 16, 24, 12)


def test_drn_c_26_runs():
    cfg = ModelConfig(net="drn_c_26", input_ch=3, n_class=5, dtype="float32")
    _, logits = _fwd(cfg)
    assert logits.shape == (1, 16, 16, 5)


def test_multichannel_input_6ch():
    cfg = ModelConfig(net="drn_d_22", input_ch=6, n_class=8, dtype="float32")
    _, logits = _fwd(cfg)
    assert logits.shape == (1, 16, 16, 8)


def test_late_fusion_score_add():
    cfg = ModelConfig(net="drn_d_22", input_ch=6, n_class=7, fusion="late", dtype="float32")
    _, logits = _fwd(cfg)
    assert logits.shape == (1, 16, 16, 7)


def test_fcn8s_vgg16():
    cfg = ModelConfig(net="fcn8s_vgg16", input_ch=3, n_class=9, dtype="float32")
    hw = (32, 32)
    variables = init_models(cfg, jax.random.key(0), img_shape=hw)
    g, f1, _ = get_models(cfg)
    x = jnp.ones((1, *hw, 3), jnp.float32)
    feats = g.apply({"params": variables["params"]["G"]}, x, False)
    assert feats[0].shape[1] == 4 and feats[1].shape[1] == 2  # /8, /16
    o = f1.apply({"params": variables["params"]["F1"]}, feats, False)
    assert o.shape == (1, 32, 32, 9)


def test_fcn8s_vgg16_non_div32_input():
    """FCN8s at /8-but-not-/32-divisible shapes (e.g. 320x240: 240/32=7.5):
    ceil-mode pooling + crop-to-skip keeps the fusion well-defined (it once
    crashed with a 14-vs-15 broadcast). At /32-divisible sizes both are
    no-ops (the golden import test pins that behavior)."""
    cfg = ModelConfig(net="fcn8s_vgg16", input_ch=3, n_class=5, dtype="float32")
    hw = (40, 24)  # /8 ok, /32 not (40/32=1.25)
    variables = init_models(cfg, jax.random.key(0), img_shape=hw)
    g, f1, _ = get_models(cfg)
    x = jnp.ones((1, *hw, 3), jnp.float32)
    feats = g.apply({"params": variables["params"]["G"]}, x, False)
    o = f1.apply({"params": variables["params"]["F1"]}, feats, False)
    assert o.shape == (1, *hw, 5)
    assert bool(jnp.all(jnp.isfinite(o)))


def test_all_drn_variants_buildable():
    # Construction only (no init — the 105 is big); validates the zoo table.
    for name in drn_variants():
        m = build_drn(name)
        assert m.out_dim == 512


def test_bf16_trunk_fp32_logits():
    cfg = ModelConfig(net="drn_d_22", input_ch=3, n_class=4, dtype="bfloat16")
    feat, logits = _fwd(cfg)
    assert feat.dtype == jnp.bfloat16
    assert logits.dtype == jnp.float32


def test_widen_first_conv_preserves_rgb_slice():
    k3 = jnp.asarray(np.random.RandomState(0).randn(7, 7, 3, 16).astype(np.float32))
    k6 = widen_first_conv_params(k3, 6)
    assert k6.shape == (7, 7, 6, 16)
    np.testing.assert_array_equal(np.asarray(k6[:, :, :3]), np.asarray(k3))
    k1 = widen_first_conv_params(k3, 1)
    np.testing.assert_allclose(
        np.asarray(k1[:, :, 0]), np.asarray(k3.sum(axis=2)), rtol=1e-6
    )


def test_bilinear_convt_matches_torch_fixed_upsample():
    """Our lhs-dilated depthwise conv == torch ConvTranspose2d(fill_up_weights)."""
    rng = np.random.RandomState(1)
    x = rng.randn(1, 4, 5, 3).astype(np.float32)
    factor = 8
    ours = np.asarray(upsample_bilinear_convt(jnp.asarray(x), factor))

    k = 2 * factor
    convt = torch.nn.ConvTranspose2d(3, 3, k, stride=factor, padding=factor // 2,
                                     groups=3, bias=False)
    w = bilinear_kernel(k)
    with torch.no_grad():
        convt.weight.copy_(torch.from_numpy(np.tile(w[None, None], (3, 1, 1, 1))))
    theirs = convt(torch.from_numpy(x).permute(0, 3, 1, 2)).detach().numpy()
    theirs = np.transpose(theirs, (0, 2, 3, 1))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_uses_one_classifier_config_roundtrip():
    cfg = ModelConfig(uses_one_classifier=True)
    d = cfg.to_dict()
    assert ModelConfig.from_dict(d) == cfg


def test_drn_d_54_bottleneck_forward():
    cfg = ModelConfig(net="drn_d_54", input_ch=3, n_class=4, dtype="float32")
    feat, logits = _fwd(cfg, hw=(16, 16))
    assert feat.shape == (1, 2, 2, 512)
    assert logits.shape == (1, 16, 16, 4)


def test_psp_net_forward():
    cfg = ModelConfig(net="psp", input_ch=3, n_class=4, dtype="float32")
    hw = (48, 48)  # PPM pooling wants a few multiples of the bin sizes
    variables = init_models(cfg, jax.random.key(0), img_shape=hw)
    g, f1, _ = get_models(cfg)
    x = jnp.ones((1, *hw, 3), jnp.float32)
    gv = {"params": variables["params"]["G"], "batch_stats": variables["batch_stats"]["G"]}
    feat = g.apply(gv, x, False)
    assert feat.shape == (1, 6, 6, 512)
    o = f1.apply({"params": variables["params"]["F1"]}, feat, False)
    assert o.shape == (1, 48, 48, 4)


def test_conv_init_is_kaiming_fan_out():
    """DRN init convention: std ~ sqrt(2/(k*k*out_ch))."""
    import numpy as np

    cfg = ModelConfig(net="drn_d_22", input_ch=3, n_class=4, dtype="float32")
    variables = init_models(cfg, jax.random.key(1), img_shape=(16, 16))
    k = np.asarray(variables["params"]["G"]["layer3"]["block0"]["conv1"]["kernel"])
    expected_std = (2.0 / (3 * 3 * k.shape[-1])) ** 0.5
    assert abs(k.std() / expected_std - 1.0) < 0.15


def test_build_drn_rejects_bad_s2d_value():
    """Typoed s2d config ('ON', 'yes', ...) must raise, not silently lose the
    TPU fast path (argparse choices only guards the CLI path)."""
    import pytest

    from mcseg_tpu.models.drn import build_drn

    for bad in ("ON", "yes", "True", "1", ""):
        with pytest.raises(ValueError, match="s2d"):
            build_drn("drn_d_22", s2d=bad)
    for ok in ("auto", "on", "off", True, False):
        build_drn("drn_d_22", s2d=ok)


def test_version_matches_pyproject():
    import os
    import re

    import mcseg_tpu

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "pyproject.toml")) as f:
        m = re.search(r'^version = "([^"]+)"', f.read(), re.M)
    assert m and mcseg_tpu.__version__ == m.group(1)


def test_vgg_s2d_auto_resolves_off():
    """'auto' must resolve to OFF for the VGG trunk (packed stage 1 measured
    a wash on v5e — see docs/ARCHITECTURE.md) while staying available via an
    explicit 'on'."""
    g_auto, _, _ = get_models(ModelConfig(net="fcn8s_vgg16", s2d="auto"))
    assert g_auto.s2d is False
    g_on, _, _ = get_models(ModelConfig(net="fcn8s_vgg16", s2d="on"))
    assert g_on.s2d is True
    g_off, _, _ = get_models(ModelConfig(net="fcn8s_vgg16", s2d="off"))
    assert g_off.s2d is False


def test_classifier_pair_fusion_exact():
    """apply_classifier_pair's fused path (one doubled-width score conv +
    one upsample) computes exactly the two separate PixelClassifier applies —
    outputs AND parameter gradients, both upsample modes."""
    from mcseg_tpu.models.heads import PixelClassifier
    from mcseg_tpu.train.apply import apply_classifier, apply_classifier_pair

    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.standard_normal((2, 8, 10, 32)), jnp.float32)
    for mode in ("resize", "convt"):
        f1 = PixelClassifier(7, upsample=mode, dtype=jnp.float32)
        f2 = PixelClassifier(7, upsample=mode, dtype=jnp.float32)
        p1 = f1.init(jax.random.key(1), feat, False)["params"]
        p2 = f2.init(jax.random.key(2), feat, False)["params"]
        # bias init is zeros; randomize so the bias path is actually checked
        p1 = {"score": {"kernel": p1["score"]["kernel"],
                        "bias": jnp.asarray(rng.standard_normal(7), jnp.float32)}}
        p2 = {"score": {"kernel": p2["score"]["kernel"],
                        "bias": jnp.asarray(rng.standard_normal(7), jnp.float32)}}

        o1f, o2f = jax.jit(
            lambda a, b: apply_classifier_pair(f1, a, f2, b, feat, True)
        )(p1, p2)
        o1 = apply_classifier(f1, p1, feat, True)
        o2 = apply_classifier(f2, p2, feat, True)
        np.testing.assert_allclose(np.asarray(o1f), np.asarray(o1),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(o2f), np.asarray(o2),
                                   rtol=1e-6, atol=1e-6)

        def loss_fused(ps):
            a, b = apply_classifier_pair(f1, ps[0], f2, ps[1], feat, True)
            return jnp.sum(a * a) + jnp.sum(jnp.abs(b))

        def loss_sep(ps):
            a = apply_classifier(f1, ps[0], feat, True)
            b = apply_classifier(f2, ps[1], feat, True)
            return jnp.sum(a * a) + jnp.sum(jnp.abs(b))

        gf = jax.jit(jax.grad(loss_fused))((p1, p2))
        gs = jax.jit(jax.grad(loss_sep))((p1, p2))
        jax.tree.map(
            lambda x, y: np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-5),
            gf, gs)


def test_classifier_pair_falls_back_for_fcn_heads():
    """Non-PixelClassifier pairs (FCN8s skip decoder) take the two-apply
    path — same results as calling apply_classifier twice."""
    from mcseg_tpu.models.fcn_vgg import FCN8sClassifier, VGG16FeatureGenerator
    from mcseg_tpu.train.apply import apply_classifier, apply_classifier_pair

    g = VGG16FeatureGenerator(input_ch=3, dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 64, 3), jnp.float32)
    gv = g.init(jax.random.key(0), x, False)
    feat = g.apply(gv, x, False)
    f1 = FCN8sClassifier(5, dtype=jnp.float32)
    f2 = FCN8sClassifier(5, dtype=jnp.float32)
    p1 = f1.init(jax.random.key(1), feat, False)["params"]
    p2 = f2.init(jax.random.key(2), feat, False)["params"]
    o1f, o2f = apply_classifier_pair(f1, p1, f2, p2, feat, False)
    np.testing.assert_array_equal(
        np.asarray(o1f), np.asarray(apply_classifier(f1, p1, feat, False)))
    np.testing.assert_array_equal(
        np.asarray(o2f), np.asarray(apply_classifier(f2, p2, feat, False)))
