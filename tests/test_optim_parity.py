"""Adam + step-LR-schedule parity vs torch (VERDICT r3 next-round #2).

`train/optim.py` documents its ``adam`` mode as "additive weight decay before
the moment estimates (torch Adam, NOT AdamW)" and its ``step`` schedule as the
reference ``adjust_learning_rate`` idiom with cadence ``max_steps // 3`` —
both claims were asserted but untested. This file pins them with the same
fp64-trajectory methodology as tests/test_trajectory_parity.py:

  * a fast unit check that `step_lr` reproduces `torch.optim.lr_scheduler.
    StepLR` (scheduler.step() once per iteration) value-for-value, boundaries
    included;
  * a 15-step fp64 trajectory of the full DRN-D-22 source step under
    opt='adam' (NONZERO weight decay — the decay-placement detail that
    distinguishes torch Adam from AdamW) with the 'step' schedule active,
    vs a `torch.optim.Adam` + `StepLR` loop: per-step losses, per-step lr,
    and final params/BN means must track to the fp64 envelope.

Detection floor: a wrong eps position (inside vs outside the sqrt) shifts the
first update by ~1e-4 relative; decoupled (AdamW-style) decay shifts params
by ~wd*lr*|p| per step, ~1e-6 absolute by step 15 on unit-scale params but
systematic and growing; a wrong bias-correction or schedule boundary lands at
the full update scale ~lr. The 1e-6 relative bound sits below all of these
while allowing the measured fp64 rounding drift (<1e-9 at these step counts).
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from mcseg_tpu.core.config import ModelConfig, TrainConfig
from mcseg_tpu.models.factory import get_models, init_models
from mcseg_tpu.train.optim import get_optimizer, step_lr
from mcseg_tpu.train.state import MCDTrainState
from tests.test_golden_drn import TorchDRND22
from tests.test_mcd_full_trunk_parity import (
    TorchF8,
    _ce,
    _import_all,
    _named_leaves,
)
from tests.test_trajectory_parity import _f64_up_weights, enable_x64  # noqa: F401

B, H, W, NC = 2, 16, 16, 5
LR, WD = 1e-3, 1e-2  # wd large enough that decay placement moves step 1
STEPS, MAX_STEPS = 15, 15  # step_size = max_steps//3 = 5: drops at 5 and 10


def test_step_schedule_matches_torch_steplr(enable_x64):  # noqa: F811
    """`step_lr` == torch StepLR stepped once per iteration, for 20 steps
    spanning two decay boundaries (incl. the boundary steps themselves).
    Runs under x64 because the schedule computes in the ambient float
    precision (f32 in production, where 1.5e-8 rounding is expected)."""
    base, step_size, gamma = 0.05, 5, 0.1
    dummy = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base)
    sched = torch.optim.lr_scheduler.StepLR(dummy, step_size, gamma)
    ours = step_lr(base, step_size, gamma)
    for i in range(20):
        torch_lr = dummy.param_groups[0]["lr"]
        np.testing.assert_allclose(float(ours(jnp.asarray(i))), torch_lr,
                                   rtol=1e-12, err_msg=f"step {i}")
        dummy.step()
        sched.step()


@pytest.mark.slow
def test_adam_step_schedule_fp64_trajectory(enable_x64):  # noqa: F811
    torch.manual_seed(7)
    tg = TorchDRND22().double()
    tf1 = _f64_up_weights(TorchF8().double())
    tf2 = _f64_up_weights(TorchF8().double())
    with torch.no_grad():
        for m in tg.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) * 0.5 + 0.75)
    init_sds = tuple(copy.deepcopy(m.state_dict()) for m in (tg, tf1, tf2))

    rng = np.random.RandomState(7)
    batches = []
    for _ in range(STEPS):
        xs = rng.rand(B, H, W, 3).astype(np.float64)
        ys = rng.randint(0, NC, (B, H, W)).astype(np.int64)
        ys[0, :2] = 255
        batches.append((xs, ys))

    # ---- torch: Adam(weight_decay) + StepLR, scheduler.step() per iter -----
    for m in (tg, tf1, tf2):
        m.train()
    opt_g = torch.optim.Adam(tg.parameters(), lr=LR, weight_decay=WD)
    f_params = [p for m in (tf1, tf2) for p in m.parameters()
                if p.requires_grad]
    opt_f = torch.optim.Adam(f_params, lr=LR, weight_decay=WD)
    step_size = MAX_STEPS // 3
    scheds = [torch.optim.lr_scheduler.StepLR(o, step_size, 0.1)
              for o in (opt_g, opt_f)]
    torch_losses, torch_lrs = [], []
    for xs, ys in batches:
        torch_lrs.append(opt_g.param_groups[0]["lr"])
        t_xs = torch.from_numpy(xs).permute(0, 3, 1, 2)
        t_ys = torch.from_numpy(ys)
        opt_g.zero_grad(); opt_f.zero_grad()
        feat = tg(t_xs)
        loss = _ce(tf1(feat), t_ys) + _ce(tf2(feat), t_ys)
        loss.backward(); opt_g.step(); opt_f.step()
        for s in scheds:
            s.step()
        torch_losses.append(loss.item())
    final_sds = tuple(copy.deepcopy(m.state_dict()) for m in (tg, tf1, tf2))

    # ---- ours: same trajectory through make_source_step(opt='adam') --------
    from mcseg_tpu.train.source import make_source_step

    cfg = ModelConfig(net="drn_d_22", input_ch=3, n_class=NC,
                      dtype="float64", upsample="convt")
    variables = init_models(cfg, jax.random.key(0), img_shape=(H, W))
    params, sg = _import_all(*init_sds, variables)
    tcfg = TrainConfig(opt="adam", lr=LR, weight_decay=WD,
                       lr_schedule="step", max_steps=MAX_STEPS)
    tx_g = get_optimizer("adam", LR, weight_decay=WD)
    tx_f = get_optimizer("adam", LR, weight_decay=WD)
    state = MCDTrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats={"G": sg, "F1": {}, "F2": {}},
        opt_g=tx_g.init(params["G"]),
        opt_f=tx_f.init({"F1": params["F1"], "F2": params["F2"]}),
        rng=jax.random.key(1),
    )
    g, f1, f2 = get_models(cfg)
    step = jax.jit(make_source_step(g, f1, f2, tx_g, tx_f, tcfg))

    ours_losses, ours_lrs = [], []
    for xs, ys in batches:
        state, metrics = step(state, jnp.asarray(xs), jnp.asarray(ys))
        ours_losses.append(float(metrics["loss"]))
        ours_lrs.append(float(metrics["lr"]))

    # the lr actually used each iteration IS the torch StepLR value —
    # cadence (max_steps//3) and boundary placement measured, not assumed
    np.testing.assert_allclose(ours_lrs, torch_lrs, rtol=1e-12)
    np.testing.assert_allclose(ours_losses, torch_losses, rtol=1e-6, atol=1e-9)

    exp_params, exp_sg = _import_all(*final_sds, variables)
    for (name, o), (_, t) in zip(_named_leaves(state.params),
                                 _named_leaves(exp_params)):
        err = np.max(np.abs(o - t))
        assert err < 1e-6 * (1.0 + np.max(np.abs(t))), (name, err)
    for (name, o), (_, t) in zip(
            _named_leaves(state.batch_stats["G"], skip_suffix=("['var']",)),
            _named_leaves(exp_sg, skip_suffix=("['var']",))):
        err = np.max(np.abs(o - t))
        assert err < 1e-6 * (1.0 + np.max(np.abs(t))), (name, err)
