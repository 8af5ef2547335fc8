"""Loss parity vs torch (the reference's framework, CPU build installed for
exactly this — SURVEY.md section 4 'unit')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from mcseg_tpu.losses.discrepancy import discrepancy_diff, discrepancy_symkl
from mcseg_tpu.losses.seg import berhu_loss, cross_entropy_2d


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def test_cross_entropy_matches_torch(rng):
    b, h, w, c = 2, 5, 7, 11
    logits = rng.randn(b, h, w, c).astype(np.float32)
    labels = rng.randint(0, c, size=(b, h, w)).astype(np.int64)
    labels[0, :2, :3] = 255  # ignored region

    ours = cross_entropy_2d(jnp.asarray(logits), jnp.asarray(labels))

    t_logits = torch.from_numpy(logits).permute(0, 3, 1, 2)  # NCHW
    t_labels = torch.from_numpy(labels)
    theirs = TF.cross_entropy(t_logits, t_labels, ignore_index=255)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-5, atol=1e-6)


def test_cross_entropy_all_ignored_is_finite(rng):
    logits = rng.randn(1, 4, 4, 3).astype(np.float32)
    labels = np.full((1, 4, 4), 255, dtype=np.int64)
    out = cross_entropy_2d(jnp.asarray(logits), jnp.asarray(labels))
    assert np.isfinite(np.asarray(out))
    assert np.asarray(out) == 0.0


def test_discrepancy_diff_matches_torch(rng):
    o1 = rng.randn(2, 4, 4, 5).astype(np.float32)
    o2 = rng.randn(2, 4, 4, 5).astype(np.float32)
    ours = discrepancy_diff(jnp.asarray(o1), jnp.asarray(o2))
    t1 = torch.softmax(torch.from_numpy(o1), dim=-1)
    t2 = torch.softmax(torch.from_numpy(o2), dim=-1)
    theirs = torch.mean(torch.abs(t1 - t2))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-5, atol=1e-7)


def test_discrepancy_identical_is_zero(rng):
    o = jnp.asarray(rng.randn(1, 3, 3, 4).astype(np.float32))
    assert np.asarray(discrepancy_diff(o, o)) == 0.0
    np.testing.assert_allclose(np.asarray(discrepancy_symkl(o, o)), 0.0, atol=1e-7)


def test_symkl_positive_and_symmetric(rng):
    o1 = jnp.asarray(rng.randn(2, 3, 3, 6).astype(np.float32))
    o2 = jnp.asarray(rng.randn(2, 3, 3, 6).astype(np.float32))
    d12 = discrepancy_symkl(o1, o2)
    d21 = discrepancy_symkl(o2, o1)
    assert np.asarray(d12) > 0
    np.testing.assert_allclose(np.asarray(d12), np.asarray(d21), rtol=1e-6)


def test_discrepancy_gradient_flows(rng):
    o1 = jnp.asarray(rng.randn(1, 2, 2, 3).astype(np.float32))
    o2 = jnp.asarray(rng.randn(1, 2, 2, 3).astype(np.float32))
    g = jax.grad(lambda a: discrepancy_diff(a, o2))(o1)
    assert np.abs(np.asarray(g)).sum() > 0


def test_berhu_loss_basic(rng):
    pred = jnp.asarray(rng.rand(1, 4, 4, 1).astype(np.float32))
    target = jnp.asarray(rng.rand(1, 4, 4).astype(np.float32) + 0.1)
    loss = berhu_loss(pred, target)
    assert np.isfinite(np.asarray(loss)) and np.asarray(loss) > 0
    exact = berhu_loss(target[..., None], target)
    np.testing.assert_allclose(np.asarray(exact), 0.0, atol=1e-7)
