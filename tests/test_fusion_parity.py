"""Late-fusion (BASELINE config 5) torch-mirror parity — VERDICT r3 #1.

The dual-branch score-fusion family (models/fusion.py: two DRN trunks, one
per RGB/HHA plane, class scores added — SURVEY.md §2 fusion row) was the one
train-step family whose correctness rested on composition arguments instead
of a cross-framework oracle. This file closes that with the SAME fp64
methodology as tests/test_trajectory_parity.py:

  * a torch dual-branch mirror (two TorchDRND22 trunks + two fixed-bilinear
    TorchF8 score heads + score add) driven through the UNCHANGED reference
    adapt_trainer loop `_run_torch_trajectory` — the loop code is shared with
    the single-trunk test, so only the model wiring differs;
  * ONE-iteration fp64 MCD parity of the ``fusion='late'`` step: every
    parameter of both trunks + all four score heads and the BN running means
    after a single A/B/C(xnum_k) iteration match to 1e-9 relative (at one
    step the fp64 trajectory drift hasn't grown yet — the bound is
    essentially machine precision, 1000x tighter than the multi-step bound);
  * a 12-step fp64 trajectory with the poly LR schedule active: per-step
    (loss_a, loss_b, loss_c) triples and the final params/BN means within
    the measured fp64 drift envelope (1e-6 relative — see
    test_trajectory_parity.py's calibration; semantic bugs land 4+ orders
    above).

What this can catch that the existing fusion tests cannot: a cross-branch
leak (e.g. HHA features reaching the RGB head), a branch whose BN stats or
optimizer updates are skipped, wrong channel split order, and any drift in
the score-add discrepancy gradients — all invisible to shape tests and to
same-framework s2d equivalence.
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
from mcseg_tpu.train.mcd import make_mcd_step
from mcseg_tpu.train.optim import get_optimizer
from mcseg_tpu.train.state import MCDTrainState
from mcseg_tpu.utils.torch_import import import_torch_state_dict
from tests.test_golden_drn import TorchDRND22
from tests.test_mcd_full_trunk_parity import TorchF8, _named_leaves, _strip_up
from tests.test_trajectory_parity import (  # noqa: F401
    LR,
    MAX_STEPS,
    MOM,
    NUM_K,
    POWER,
    _f64_up_weights,
    _poly_lr,
    _run_torch_trajectory,
    enable_x64,
)

B, H, W, NC = 2, 16, 16, 5
STEPS = 12  # >= 10 (VERDICT r3 #1b); MAX_STEPS stays 40 (shared _poly_lr)


class TorchLateG(tnn.Module):
    """Torch mirror of models/fusion.py:LateFusionGenerator — two independent
    DRN-D-22 trunks, channels [0:3] -> rgb trunk, [3:6] -> hha trunk."""

    def __init__(self):
        super().__init__()
        self.rgb = TorchDRND22()
        self.hha = TorchDRND22()

    def forward(self, x):  # x: [B, 6, H, W]
        return self.rgb(x[:, 0:3]), self.hha(x[:, 3:6])


class TorchLateF(tnn.Module):
    """Torch mirror of LateFusionClassifier: per-branch 1x1 score conv +
    fixed-bilinear 8x upsample, logits ADDED (score fusion)."""

    def __init__(self, n_class=NC):
        super().__init__()
        self.rgb_head = TorchF8(n_class)
        self.hha_head = TorchF8(n_class)

    def forward(self, feats):
        return self.rgb_head(feats[0]) + self.hha_head(feats[1])


def _sub_sd(sd, prefix):
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _import_fusion(tg_sd, tf1_sd, tf2_sd, variables):
    """Torch dual-branch state dicts -> our late-fusion param/stats trees,
    one import_torch_state_dict call per branch subtree (the shape-signature
    matcher is per-module; slicing by prefix keeps rgb/hha unambiguous)."""
    pg, sg = {}, {}
    for branch, pre in (("rgb_trunk", "rgb."), ("hha_trunk", "hha.")):
        p, s = import_torch_state_dict(
            _sub_sd(tg_sd, pre),
            variables["params"]["G"][branch],
            dict(variables["batch_stats"]["G"][branch]))
        pg[branch] = p
        sg[branch] = s
    out = {"G": pg}
    for fk, sd in (("F1", tf1_sd), ("F2", tf2_sd)):
        sub = {}
        for branch, pre in (("rgb_head", "rgb_head."),
                            ("hha_head", "hha_head.")):
            p, _ = import_torch_state_dict(
                _strip_up(_sub_sd(sd, pre)),
                variables["params"][fk][branch], {})
            sub[branch] = p
        out[fk] = sub
    return out, sg


def _fresh_torch_stack(init_sds=None):
    tg = TorchLateG().double()
    tf1, tf2 = TorchLateF().double(), TorchLateF().double()
    for tf in (tf1, tf2):
        _f64_up_weights(tf.rgb_head)
        _f64_up_weights(tf.hha_head)
    if init_sds is not None:
        for m, sd in zip((tg, tf1, tf2), init_sds):
            m.load_state_dict({k: v.clone() for k, v in sd.items()})
    return tg, tf1, tf2


def _assert_tree_close(ours, torch_sds, variables, bound, what):
    exp, exp_sg = _import_fusion(*torch_sds, variables)
    for (name, o), (_, t) in zip(_named_leaves(ours.params),
                                 _named_leaves(exp)):
        err = np.max(np.abs(o - t))
        assert err < bound * (1.0 + np.max(np.abs(t))), (what, name, err)
    for (name, o), (_, t) in zip(
            _named_leaves(ours.batch_stats["G"], skip_suffix=("['var']",)),
            _named_leaves(exp_sg, skip_suffix=("['var']",))):
        err = np.max(np.abs(o - t))
        assert err < bound * (1.0 + np.max(np.abs(t))), (what, name, err)


@pytest.mark.slow
def test_late_fusion_fp64_mcd_parity(enable_x64):  # noqa: F811
    torch.manual_seed(11)
    tg, tf1, tf2 = _fresh_torch_stack()
    with torch.no_grad():
        for m in tg.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) * 0.5 + 0.75)
    init_sds = tuple(copy.deepcopy(m.state_dict()) for m in (tg, tf1, tf2))

    rng = np.random.RandomState(11)
    batches = []
    for _ in range(STEPS):
        xs = rng.rand(B, H, W, 6).astype(np.float64)
        ys = rng.randint(0, NC, (B, H, W)).astype(np.int64)
        ys[0, :2] = 255  # ignore_index masking active
        xt = rng.rand(B, H, W, 6).astype(np.float64)
        batches.append((xs, ys, xt))

    # torch side A: ONE iteration from init (fresh optimizers == step-0 state)
    tg1, tf11, tf21 = _fresh_torch_stack(init_sds)
    _run_torch_trajectory(tg1, tf11, tf21, batches[:1])
    step1_sds = tuple(copy.deepcopy(m.state_dict()) for m in (tg1, tf11, tf21))

    # torch side B: the full 12-step trajectory from the same init
    torch_losses = _run_torch_trajectory(tg, tf1, tf2, batches)
    final_sds = tuple(copy.deepcopy(m.state_dict()) for m in (tg, tf1, tf2))

    # ---- ours: fusion='late' through the UNCHANGED fusion-agnostic MCD step
    cfg = ModelConfig(net="drn_d_22", input_ch=6, n_class=NC, fusion="late",
                      dtype="float64", upsample="convt")
    variables = init_models(cfg, jax.random.key(0), img_shape=(H, W))
    params, sg = _import_fusion(*init_sds, variables)

    tcfg = TrainConfig(opt="sgd", lr=LR, momentum=MOM, weight_decay=0.0,
                       num_k=NUM_K, d_loss="diff", lr_schedule="poly",
                       lr_power=POWER, max_steps=MAX_STEPS)
    tx_g = get_optimizer("sgd", LR, MOM, 0.0)
    tx_f = get_optimizer("sgd", LR, MOM, 0.0)
    state = MCDTrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats={"G": sg, "F1": {}, "F2": {}},
        opt_g=tx_g.init(params["G"]),
        opt_f=tx_f.init({"F1": params["F1"], "F2": params["F2"]}),
        rng=jax.random.key(1),
    )
    g, f1, f2 = get_models(cfg)
    step = jax.jit(make_mcd_step(g, f1, f2, tx_g, tx_f, tcfg))

    ours_losses, ours_lrs = [], []
    for i, (xs, ys, xt) in enumerate(batches):
        state, metrics = step(state, jnp.asarray(xs), jnp.asarray(ys),
                              jnp.asarray(xt))
        ours_losses.append((float(metrics["loss_source"]),
                            float(metrics["loss_b"]),
                            float(metrics["loss_dis"])))
        ours_lrs.append(float(metrics["lr"]))
        if i == 0:
            # (a) ONE-iteration parity: near-machine-precision bound — the
            # trajectory's Lyapunov growth hasn't amplified rounding yet
            _assert_tree_close(state, step1_sds, variables, 1e-9, "1-iter")

    np.testing.assert_allclose(
        ours_lrs, [_poly_lr(i) for i in range(STEPS)], rtol=1e-12)
    # (b) per-step loss triples track the torch dual-branch loop throughout
    np.testing.assert_allclose(np.asarray(ours_losses),
                               np.asarray(torch_losses),
                               rtol=1e-6, atol=1e-9)
    # final params + BN means within the measured fp64 drift envelope
    _assert_tree_close(state, final_sds, variables, 1e-6, "12-step")
