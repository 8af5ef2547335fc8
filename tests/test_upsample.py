"""Matmul upsampling == jax.image.resize / fixed-bilinear ConvTranspose
(exactness of the MXU-native decoder path)."""

import jax
import jax.numpy as jnp
import numpy as np

from mcseg_tpu.models.heads import upsample_bilinear_convt
from mcseg_tpu.ops.upsample import interp_matrix, upsample_matmul


def _x(b=2, h=6, w=8, c=5, seed=0):
    return jnp.asarray(np.random.RandomState(seed).rand(b, h, w, c).astype(np.float32))


def test_matmul_matches_jax_image_resize():
    x = _x()
    want = jax.image.resize(x, (2, 48, 64, 5), method="bilinear")
    got = upsample_matmul(x, 48, 64, mode="resize")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_matmul_matches_convt():
    x = _x()
    want = upsample_bilinear_convt(x, 8)
    got = upsample_matmul(x, 48, 64, mode="convt")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_matmul_resize_non_integer_scale():
    x = _x(h=6, w=8)
    want = jax.image.resize(x, (2, 15, 20, 5), method="bilinear")
    got = upsample_matmul(x, 15, 20, mode="resize")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_rows_sum_to_one():
    a = np.asarray(interp_matrix(48, 6, "resize"))
    np.testing.assert_allclose(a.sum(axis=1), 1.0, rtol=1e-5)
    # convt: partition of unity holds in the interior; borders see partial
    # kernel support (torch ConvTranspose2d behavior, matched by design)
    a = np.asarray(interp_matrix(48, 6, "convt"))
    f = 8
    np.testing.assert_allclose(a.sum(axis=1)[f:-f], 1.0, rtol=1e-5)


def test_gradient_flows_and_is_transpose():
    x = _x(b=1, h=4, w=4, c=1)
    g = jax.grad(lambda v: upsample_matmul(v, 32, 32, "resize").sum())(x)
    a32 = np.asarray(interp_matrix(32, 4, "resize"))
    # grad of sum = A_h^T 1 outer A_w^T 1
    expect = np.outer(a32.sum(axis=0), a32.sum(axis=0))[None, :, :, None]
    np.testing.assert_allclose(np.asarray(g), expect, rtol=1e-4, atol=1e-5)


def test_bf16_path():
    x = _x().astype(jnp.bfloat16)
    out = upsample_matmul(x, 48, 64, mode="resize", out_dtype=jnp.float32)
    assert out.dtype == jnp.float32
    ref = jax.image.resize(x.astype(jnp.float32), (2, 48, 64, 5), method="bilinear")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)
