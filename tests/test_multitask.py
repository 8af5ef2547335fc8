"""Multitask (seg + aux depth) steps: losses finite & decreasing; depth head
params live under 'D' and train in step A only (SURVEY.md section 2 multitask
variant)."""

import jax
import jax.numpy as jnp
import numpy as np

from mcseg_tpu.core.config import ModelConfig, TrainConfig
from mcseg_tpu.models.factory import get_models
from mcseg_tpu.train.multitask import (
    init_multitask_state,
    make_multitask_mcd_step,
    make_multitask_source_step,
)

HW = (16, 16)
NCLASS = 5


def _setup(num_k=1):
    mcfg = ModelConfig(net="drn_d_22", input_ch=3, n_class=NCLASS, dtype="float32")
    tcfg = TrainConfig(lr=0.05, num_k=num_k, lr_schedule="constant", max_steps=100)
    state, tx_g, tx_f, d_head = init_multitask_state(
        mcfg, tcfg, jax.random.key(0), img_shape=HW
    )
    g, f1, f2 = get_models(mcfg)
    return mcfg, tcfg, state, tx_g, tx_f, g, f1, f2, d_head


def _batch(seed=0, b=2):
    rng = np.random.RandomState(seed)
    img = jnp.asarray(rng.rand(b, *HW, 3).astype(np.float32))
    label = jnp.asarray(rng.randint(0, NCLASS, size=(b, *HW)))
    depth = jnp.asarray(rng.rand(b, *HW).astype(np.float32) * 3 + 0.3)
    return img, label, depth


def test_multitask_state_has_depth_subtree():
    _, _, state, _, _, _, _, _, _ = _setup()
    assert "D" in state.params
    assert jax.tree.leaves(state.params["D"])


def test_multitask_source_step_decreases_loss():
    _, tcfg, state, tx_g, tx_f, g, f1, f2, d_head = _setup()
    step = jax.jit(make_multitask_source_step(g, f1, f2, d_head, tx_g, tx_f, tcfg))
    img, label, depth = _batch()
    losses = []
    for _ in range(6):
        state, m = step(state, img, label, depth)
        losses.append(float(m["loss"]))
        assert np.isfinite(m["loss_seg"]) and np.isfinite(m["loss_depth"])
    assert losses[-1] < losses[0], losses


def test_multitask_mcd_step_runs():
    _, tcfg, state, tx_g, tx_f, g, f1, f2, d_head = _setup(num_k=2)
    step = jax.jit(make_multitask_mcd_step(g, f1, f2, d_head, tx_g, tx_f, tcfg))
    xs, ys, ds = _batch(0)
    xt, _, _ = _batch(1)
    d0 = jax.tree.map(lambda x: np.asarray(x).copy(), state.params["D"])
    state, m = step(state, xs, ys, ds, xt)
    for k in ("loss_source", "loss_seg", "loss_depth", "loss_b", "loss_dis"):
        assert np.isfinite(float(m[k])), (k, m)
    changed = any(
        not np.allclose(a, np.asarray(b))
        for a, b in zip(jax.tree.leaves(d0), jax.tree.leaves(state.params["D"]))
    )
    assert changed  # depth head updated in step A


def test_depth_metrics():
    import jax.numpy as jnp
    from mcseg_tpu.eval.depth_metrics import depth_metrics

    t = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8).astype(np.float32) + 0.5)
    m = depth_metrics(t[..., None], t)
    assert float(m["rmse"]) < 1e-6
    assert float(m["abs_rel"]) < 1e-6
    assert float(m["delta_1.25"]) == 1.0
    m2 = depth_metrics(t[..., None] * 1.5, t)
    assert float(m2["abs_rel"]) > 0.4
    assert float(m2["delta_1.25"]) == 0.0
    # invalid pixels excluded
    t3 = t.at[0, 0, 0].set(0.0)
    m3 = depth_metrics(t[..., None], t3)
    assert float(m3["rmse"]) < 1e-6
