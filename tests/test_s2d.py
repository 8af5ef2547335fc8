"""Exactness tests for the space-to-depth packed execution (ops/s2d.py).

The packed path must compute the SAME function as the plain path — it is a
layout transform, not an architecture change (SURVEY.md section 2 DRN row:
the network is the reference's; only the TPU execution differs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import flax.linen as nn

from mcseg_tpu.ops.s2d import (
    PackedBatchNorm,
    depth_to_space,
    packed_conv,
    space_to_depth,
)


def test_s2d_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 16, 5), jnp.float32)
    assert jnp.array_equal(depth_to_space(space_to_depth(x, 2, 4), 2, 4), x)


@pytest.mark.parametrize(
    "k,s,pi,po",
    [
        (7, 1, (2, 4), (2, 4)),  # conv0 stem
        (3, 1, (2, 4), (2, 4)),  # layer1
        (3, 2, (2, 4), (1, 2)),  # layer2 first conv (stride absorbed)
        (3, 1, (1, 2), (1, 2)),  # layer2 extra convs
        (7, 1, (2, 2), (2, 2)),  # alternate pack factors
        (3, 2, (2, 2), (1, 1)),  # consume-packed, emit-unpacked
        (1, 2, (2, 2), (1, 1)),  # 1x1 stride-2 projection
        (3, 2, (1, 2), (1, 2)),  # layer3 block0 conv1 (packed through)
        (1, 2, (1, 2), (1, 2)),  # layer3 block0 projection
        (3, 1, (1, 2), (1, 2)),  # layer3 inner convs
        (3, 2, (1, 2), (1, 1)),  # layer4 block0 conv1 (consume packed)
        (1, 2, (1, 2), (1, 1)),  # layer4 block0 projection
    ],
)
def test_packed_conv_matches_plain(k, s, pi, po):
    rng = np.random.RandomState(k * 10 + s)
    ci, co = 5, 7
    n, h, w = 2, 16, 16
    pad = k // 2
    x = jnp.asarray(rng.randn(n, h, w, ci), jnp.float32)
    wgt = jnp.asarray(rng.randn(k, k, ci, co), jnp.float32)

    ref = jax.lax.conv_general_dilated(
        x, wgt, (s, s), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = packed_conv(space_to_depth(x, *pi), wgt, (s, s), (pad, pad), pi, po)
    got = depth_to_space(got, *po)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_packed_conv_weight_grads_match():
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 8, 16, 3), jnp.float32)
    wgt = jnp.asarray(rng.randn(7, 7, 3, 4), jnp.float32)

    def loss_plain(w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(jnp.sin(y))

    def loss_packed(w):
        y = packed_conv(space_to_depth(x, 2, 4), w, (1, 1), (3, 3), (2, 4), (2, 4))
        return jnp.sum(jnp.sin(depth_to_space(y, 2, 4)))

    gp = jax.grad(loss_plain)(wgt)
    gq = jax.grad(loss_packed)(wgt)
    # identical math; tolerance covers float32 reduction-order differences
    np.testing.assert_allclose(np.asarray(gq), np.asarray(gp), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("train", [True, False])
def test_packed_bn_matches_flax(train):
    rng = np.random.RandomState(3)
    c, p = 6, 8
    x = jnp.asarray(rng.randn(2, 4, 8, c).astype(np.float32) * 2 + 1)
    bn = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)
    vs = bn.init(jax.random.key(0), x)
    # non-trivial affine + running stats
    vs = {
        "params": {
            "scale": jnp.asarray(rng.rand(c), jnp.float32) + 0.5,
            "bias": jnp.asarray(rng.randn(c), jnp.float32),
        },
        "batch_stats": {
            "mean": jnp.asarray(rng.randn(c), jnp.float32),
            "var": jnp.asarray(rng.rand(c), jnp.float32) + 0.5,
        },
    }
    if train:
        ref, upd = bn.apply(x=x, variables=vs, mutable=["batch_stats"])
    else:
        ref = bn.apply(x=x, variables=vs)

    xp = space_to_depth(x, 2, 4)
    pbn = PackedBatchNorm(groups=p)
    if train:
        got, pupd = pbn.apply(vs, xp, True, mutable=["batch_stats"])
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(pupd["batch_stats"][k]),
                np.asarray(upd["batch_stats"][k]), rtol=1e-5, atol=1e-6)
    else:
        got = pbn.apply(vs, xp, False)
    np.testing.assert_allclose(
        np.asarray(depth_to_space(got, 2, 4)), np.asarray(ref),
        rtol=1e-4, atol=1e-5)


def test_drn_s2d_forward_and_grads_match():
    net = "drn_d_38"
    from mcseg_tpu.models.drn import build_drn

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.rand(2, 16, 32, 6), jnp.float32)
    plain = build_drn(net, input_ch=6, dtype=jnp.float32, s2d="off")
    packed = build_drn(net, input_ch=6, dtype=jnp.float32, s2d="on")
    vs = plain.init(jax.random.key(0), x, False)
    assert jax.tree_util.tree_structure(
        packed.init(jax.random.key(0), x, False)
    ) == jax.tree_util.tree_structure(vs), "variable trees must be identical"

    # eval-mode forward
    y0 = plain.apply(vs, x, False)
    y1 = packed.apply(vs, x, False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=1e-4, atol=1e-4)

    # train-mode forward + batch-stats updates + grads
    def loss(m, params):
        y, upd = m.apply(
            {"params": params, "batch_stats": vs["batch_stats"]}, x, True,
            mutable=["batch_stats"])
        return jnp.mean(jnp.square(y)), upd["batch_stats"]

    (l0, bs0), g0 = jax.value_and_grad(
        lambda p: loss(plain, p), has_aux=True)(vs["params"])
    (l1, bs1), g1 = jax.value_and_grad(
        lambda p: loss(packed, p), has_aux=True)(vs["params"])
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4),
        g1, g0)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        bs1, bs0)


def test_drn_c_s2d_forward_matches_fast():
    """Fast-subset coverage of the arch-C packed path (PackedResStage with
    residual BasicBlocks): tree identity + eval-mode forward parity. The
    gradient-level exactness lives in the slow f64 oracle below."""
    from mcseg_tpu.models.drn import build_drn

    rng = np.random.RandomState(13)
    x = jnp.asarray(rng.rand(2, 16, 32, 3), jnp.float32)
    plain = build_drn("drn_c_26", input_ch=3, dtype=jnp.float32, s2d="off")
    packed = build_drn("drn_c_26", input_ch=3, dtype=jnp.float32, s2d="on")
    vs = plain.init(jax.random.key(0), x, False)
    assert jax.tree_util.tree_structure(
        packed.init(jax.random.key(0), x, False)
    ) == jax.tree_util.tree_structure(vs)
    y0 = plain.apply(vs, x, False)
    y1 = packed.apply(vs, x, False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("net", ["drn_d_54", "drn_c_26"])
def test_drn_s2d_exact_under_f64_oracle(net):
    """Deep-variant (Bottleneck) and arch-C (residual levels 1-2) parity,
    judged in float64.

    In float32 the packed path's reduction-order noise chaos-amplifies
    through drn_d_54's 50+ random-init layers of backprop, so raw f32 grad
    comparison is meaningless. The principled check (same pattern as
    tests/test_sharding.py): run both paths in float64 — identical math must
    agree to ~1e-9, far below any real divergence.
    """
    import contextlib

    from mcseg_tpu.models.drn import build_drn

    @contextlib.contextmanager
    def enable_x64():
        jax.config.update("jax_enable_x64", True)
        try:
            yield
        finally:
            jax.config.update("jax_enable_x64", False)

    with enable_x64():
        rng = np.random.RandomState(11)
        x = jnp.asarray(rng.rand(2, 16, 32, 6), jnp.float64)
        plain = build_drn(net, input_ch=6, dtype=jnp.float64, s2d="off")
        packed = build_drn(net, input_ch=6, dtype=jnp.float64, s2d="on")
        vs = plain.init(jax.random.key(0), x, False)
        vs = jax.tree.map(
            lambda a: a.astype(jnp.float64) if a.dtype == jnp.float32 else a, vs)

        def loss(m, p):
            y, upd = m.apply(
                {"params": p, "batch_stats": vs["batch_stats"]}, x, True,
                mutable=["batch_stats"])
            return jnp.mean(jnp.square(y)), upd["batch_stats"]

        (l0, bs0), g0 = jax.value_and_grad(
            lambda p: loss(plain, p), has_aux=True)(vs["params"])
        (l1, bs1), g1 = jax.value_and_grad(
            lambda p: loss(packed, p), has_aux=True)(vs["params"])
        np.testing.assert_allclose(float(l1), float(l0), rtol=1e-12)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-10),
            (g1, bs1), (g0, bs0))


def test_packed_conv_rejects_truncating_geometry():
    x = jnp.asarray(np.random.RandomState(0).rand(1, 18, 16, 4), jnp.float32)
    wgt = jnp.asarray(np.random.RandomState(1).randn(3, 3, 4, 4), jnp.float32)
    with pytest.raises(ValueError, match="not divisible by out_pack"):
        packed_conv(space_to_depth(x, 2, 2), wgt, (2, 2), (1, 1), (2, 2), (2, 2))


def test_late_fusion_honors_s2d():
    """--fusion late threads cfg.s2d into both trunks: packed and plain
    late-fusion generators share one parameter tree and compute the same
    features."""
    from mcseg_tpu.models.fusion import LateFusionGenerator

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.rand(1, 16, 32, 6), jnp.float32)
    plain = LateFusionGenerator(net="drn_d_22", dtype=jnp.float32, s2d="off")
    packed = LateFusionGenerator(net="drn_d_22", dtype=jnp.float32, s2d="on")
    vs = plain.init(jax.random.key(0), x, False)
    assert jax.tree_util.tree_structure(
        packed.init(jax.random.key(0), x, False)
    ) == jax.tree_util.tree_structure(vs)
    y0 = plain.apply(vs, x, False)
    y1 = packed.apply(vs, x, False)
    for a, b in zip(y1, y0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_vgg_s2d_exact_under_f64_oracle():
    """VGG-FCN8s stage-1 packed execution (pack (1,2), pool1's W direction
    consumed as a channel-group max) computes the same function as the plain
    trunk —
    forward features AND parameter grads, judged in float64 (same oracle
    pattern as the DRN test above). Biased packed convs included."""
    import contextlib

    from mcseg_tpu.models.fcn_vgg import VGG16FeatureGenerator

    @contextlib.contextmanager
    def enable_x64():
        jax.config.update("jax_enable_x64", True)
        try:
            yield
        finally:
            jax.config.update("jax_enable_x64", False)

    with enable_x64():
        rng = np.random.RandomState(7)
        # smallest /32-divisible geometry: the packed path only touches
        # stage 1, and f64 conv6 (7x7x512x4096) dominates at larger sizes
        x = jnp.asarray(rng.rand(1, 32, 64, 3), jnp.float64)
        plain = VGG16FeatureGenerator(input_ch=3, dtype=jnp.float64, s2d=False)
        packed = VGG16FeatureGenerator(input_ch=3, dtype=jnp.float64, s2d=True)
        # Params via eval_shape (trace only — skips two expensive f64
        # full-trunk CPU compiles); values are arbitrary for an exactness
        # test, so fill the shapes from one RandomState.
        # close over x/train so eval_shape doesn't trace the bool `train`
        # (Dropout's `not train` needs a concrete value)
        shapes0 = jax.eval_shape(lambda k: plain.init(k, x, False),
                                 jax.random.key(0))
        shapes1 = jax.eval_shape(lambda k: packed.init(k, x, False),
                                 jax.random.key(0))
        assert set(shapes0["params"]) == set(
            shapes1["params"]
        ), "packed/plain parameter trees must be interchangeable"
        assert jax.tree.map(lambda a: a.shape, shapes0) == jax.tree.map(
            lambda a: a.shape, shapes1)
        params = jax.tree.map(
            lambda a: jnp.asarray(rng.standard_normal(a.shape) * 0.1,
                                  jnp.float64), shapes0)["params"]

        def loss(m, p):
            # pool3/pool4 only: everything the packed stage feeds is covered,
            # and (under jit) XLA DCEs stage 5 + the 4096-wide conv6/7
            # (identical plain code on both variants, covered elsewhere)
            # whose f64 CPU compile+grad otherwise dominates the suite's
            # wall-clock.
            p3, p4, _ = m.apply({"params": p}, x, False)
            return jnp.mean(jnp.square(p3)) + jnp.mean(jnp.square(p4))

        l0, g0 = jax.jit(jax.value_and_grad(lambda p: loss(plain, p)))(params)
        l1, g1 = jax.jit(jax.value_and_grad(lambda p: loss(packed, p)))(params)
        np.testing.assert_allclose(float(l1), float(l0), rtol=1e-12)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-10),
            g1, g0)


def test_vgg_s2d_odd_shape_falls_back():
    """Non-/2-divisible inputs skip the packed path instead of failing."""
    from mcseg_tpu.models.fcn_vgg import VGG16FeatureGenerator

    x = jnp.asarray(np.random.RandomState(0).rand(1, 33, 35, 3), jnp.float32)
    m = VGG16FeatureGenerator(input_ch=3, dtype=jnp.float32, s2d=True)
    vs = m.init(jax.random.key(0), x, False)
    p3, p4, d7 = m.apply(vs, x, False)
    assert p3.shape[1:3] == (5, 5) and p4.shape[1:3] == (3, 3)
