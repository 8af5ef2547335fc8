"""Numerics parity: our single-jit MCD step vs a torch-CPU reimplementation of
the reference's 3-step loop (SURVEY.md section 4 'numerics-parity', tolerance
~1e-5 fp32).

The torch side replicates adapt_trainer.py's idiom exactly (SURVEY.md section
3.2): two optimizers, zero-both-step-one freezing, BN in train mode in every
forward, CE(mean over valid) + mean|softmax diff| discrepancy, num_k
generator-only steps with a fresh forward each. The flax side is the
production `make_mcd_step` with a tiny G (conv-BN-relu, stride 2) and the real
PixelClassifier head in 'convt' mode (fixed-bilinear transposed conv — the
reference decoder, frozen). Weights are transferred with the import shim; if
EVERY parameter matches after one full iteration, the freeze semantics,
optimizer coupling, loss math, and BN behavior all agree.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as TF

from mcseg_tpu.core.config import TrainConfig
from mcseg_tpu.models.heads import PixelClassifier, bilinear_kernel
from mcseg_tpu.train.mcd import make_mcd_step
from mcseg_tpu.train.optim import get_optimizer
from mcseg_tpu.train.state import MCDTrainState
from mcseg_tpu.utils.torch_import import import_torch_state_dict

B, H, W, CH, NC = 2, 16, 16, 8, 5
LR, MOM, NUM_K = 0.05, 0.9, 2


class TinyG(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(CH, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn")(x)
        return nn.relu(x)


def _torch_g():
    return tnn.Sequential(
        tnn.Conv2d(3, CH, 3, 2, 1, bias=False), tnn.BatchNorm2d(CH), tnn.ReLU()
    )


class _TorchF(tnn.Module):
    def __init__(self):
        super().__init__()
        self.score = tnn.Conv2d(CH, NC, 1)
        self.up = tnn.ConvTranspose2d(NC, NC, 4, 2, 1, groups=NC, bias=False)
        with torch.no_grad():
            k = torch.from_numpy(bilinear_kernel(4))
            self.up.weight.copy_(k[None, None].repeat(NC, 1, 1, 1))
        self.up.weight.requires_grad_(False)

    def forward(self, x):
        return self.up(self.score(x))


def _disc(o1, o2):
    return torch.mean(torch.abs(torch.softmax(o1, 1) - torch.softmax(o2, 1)))


def _ce(o, y):
    return TF.cross_entropy(o, y, ignore_index=255)


def test_mcd_step_matches_torch_reference_loop():
    torch.manual_seed(0)
    tg, tf1, tf2 = _torch_g(), _TorchF(), _TorchF()
    for m in (tg, tf1, tf2):
        m.train()

    rng = np.random.RandomState(0)
    xs = rng.rand(B, H, W, 3).astype(np.float32)
    ys = rng.randint(0, NC, (B, H, W)).astype(np.int64)
    ys[0, :2] = 255
    xt = rng.rand(B, H, W, 3).astype(np.float32)

    # ---------------- torch reference loop (one iteration) -----------------
    t_xs = torch.from_numpy(xs).permute(0, 3, 1, 2)
    t_xt = torch.from_numpy(xt).permute(0, 3, 1, 2)
    t_ys = torch.from_numpy(ys)
    opt_g = torch.optim.SGD(tg.parameters(), lr=LR, momentum=MOM)
    f_params = [p for p in list(tf1.parameters()) + list(tf2.parameters())
                if p.requires_grad]
    opt_f = torch.optim.SGD(f_params, lr=LR, momentum=MOM)

    # STEP A (reference shares ONE G forward between both classifiers)
    opt_g.zero_grad(); opt_f.zero_grad()
    feat = tg(t_xs)
    loss = _ce(tf1(feat), t_ys) + _ce(tf2(feat), t_ys)
    loss.backward(); opt_g.step(); opt_f.step()
    # STEP B
    opt_g.zero_grad(); opt_f.zero_grad()
    feat_s = tg(t_xs); feat_t = tg(t_xt)
    loss = (_ce(tf1(feat_s), t_ys) + _ce(tf2(feat_s), t_ys)
            - _disc(tf1(feat_t), tf2(feat_t)))
    loss.backward(); opt_f.step()
    # STEP C x num_k
    for _ in range(NUM_K):
        opt_g.zero_grad(); opt_f.zero_grad()
        feat_t = tg(t_xt)
        loss_d = _disc(tf1(feat_t), tf2(feat_t))
        loss_d.backward(); opt_g.step()

    # ------------------------------- ours ----------------------------------
    g = TinyG()
    f1 = PixelClassifier(NC, up_factor=2, upsample="convt", dtype=jnp.float32)
    f2 = PixelClassifier(NC, up_factor=2, upsample="convt", dtype=jnp.float32)

    # fresh torch copies for the initial weights (the loop above mutated them)
    torch.manual_seed(0)
    ig, if1, if2 = _torch_g(), _TorchF(), _TorchF()

    def flax_from(mod, torch_mod, sample):
        variables = mod.init(jax.random.key(0), sample, False)
        sd = {k: v for k, v in torch_mod.state_dict().items() if "up." not in k}
        params, stats = import_torch_state_dict(
            sd, variables["params"], dict(variables.get("batch_stats", {}))
        )
        return params, stats

    x_sample = jnp.zeros((B, H, W, 3))
    f_sample = jnp.zeros((B, H // 2, W // 2, CH))
    pg, sg = flax_from(g, ig, x_sample)
    pf1, _ = flax_from(f1, if1, f_sample)
    pf2, _ = flax_from(f2, if2, f_sample)

    cfg = TrainConfig(opt="sgd", lr=LR, momentum=MOM, weight_decay=0.0,
                      num_k=NUM_K, d_loss="diff", lr_schedule="constant",
                      max_steps=100)
    tx_g = get_optimizer("sgd", LR, MOM, 0.0)
    tx_f = get_optimizer("sgd", LR, MOM, 0.0)
    params = {"G": pg, "F1": pf1, "F2": pf2}
    state = MCDTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats={"G": sg, "F1": {}, "F2": {}},
        opt_g=tx_g.init(params["G"]),
        opt_f=tx_f.init({"F1": pf1, "F2": pf2}),
        rng=jax.random.key(1),
    )
    step = jax.jit(make_mcd_step(g, f1, f2, tx_g, tx_f, cfg))
    state, metrics = step(state, jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(xt))

    # -------------------------- compare parameters -------------------------
    def t2np_conv(w):
        return w.detach().numpy().transpose(2, 3, 1, 0)

    np.testing.assert_allclose(
        np.asarray(state.params["G"]["conv"]["kernel"]),
        t2np_conv(tg[0].weight), rtol=2e-5, atol=2e-6,
    )
    np.testing.assert_allclose(
        np.asarray(state.params["G"]["bn"]["scale"]),
        tg[1].weight.detach().numpy(), rtol=2e-5, atol=2e-6,
    )
    np.testing.assert_allclose(
        np.asarray(state.params["G"]["bn"]["bias"]),
        tg[1].bias.detach().numpy(), rtol=2e-5, atol=2e-6,
    )
    for ours, theirs in ((state.params["F1"], tf1), (state.params["F2"], tf2)):
        np.testing.assert_allclose(
            np.asarray(ours["score"]["kernel"])[0, 0],
            theirs.score.weight.detach().numpy()[:, :, 0, 0].T,
            rtol=2e-5, atol=2e-6,
        )
        np.testing.assert_allclose(
            np.asarray(ours["score"]["bias"]),
            theirs.score.bias.detach().numpy(), rtol=2e-5, atol=2e-6,
        )
    # BN running mean must agree exactly (updated in the same forwards, same
    # order, same momentum). Running VAR differs by convention — torch updates
    # with the unbiased (Bessel) batch variance, flax with the biased one —
    # which never affects train-mode math or the params compared above, so it
    # is deliberately not compared (documented divergence).
    np.testing.assert_allclose(
        np.asarray(state.batch_stats["G"]["bn"]["mean"]),
        tg[1].running_mean.detach().numpy(), rtol=1e-4, atol=1e-6,
    )


def test_step_c_uses_fresh_dropout_each_repetition():
    """Step C must draw a NEW dropout mask per num_k repetition (the reference
    does num_k independent forwards). Setup isolates the mask as the only
    varying factor: lr=0 freezes params, the trunk has dropout but no BN, so
    loss_dis(num_k=2)'s last repetition can differ from loss_dis(num_k=1)'s
    only through a fresh mask."""

    class DropG(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(CH, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        use_bias=True, name="conv")(x)
            return nn.Dropout(0.5, deterministic=not train)(x)

    gm = DropG()
    f1m = PixelClassifier(NC, up_factor=2, upsample="convt")
    f2m = PixelClassifier(NC, up_factor=2, upsample="convt")
    key = jax.random.key(0)
    x = jnp.zeros((B, H, W, 3))
    gv = gm.init({"params": key, "dropout": key}, x, False)
    feat = gm.apply(gv, x, False)
    f1v = f1m.init(key, feat, False)
    f2v = f2m.init(jax.random.key(1), feat, False)
    params = {"G": gv["params"], "F1": f1v["params"], "F2": f2v["params"]}

    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    lbl = jnp.asarray(rng.randint(0, NC, (B, H, W)))
    tgt = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))

    def run(num_k):
        cfg = TrainConfig(lr=0.0, momentum=0.0, weight_decay=0.0,
                          num_k=num_k, lr_schedule="constant")
        tx_g = get_optimizer(cfg.opt, cfg.lr, cfg.momentum, cfg.weight_decay)
        tx_f = get_optimizer(cfg.opt, cfg.lr, cfg.momentum, cfg.weight_decay)
        state = MCDTrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            batch_stats={"G": {}, "F1": {}, "F2": {}},
            opt_g=tx_g.init(params["G"]),
            opt_f=tx_f.init({"F1": params["F1"], "F2": params["F2"]}),
            rng=jax.random.key(7),
        )
        step = jax.jit(make_mcd_step(gm, f1m, f2m, tx_g, tx_f, cfg))
        new_state, metrics = step(state, src, lbl, tgt)
        # lr=0 really froze everything
        np.testing.assert_array_equal(
            np.asarray(new_state.params["G"]["conv"]["kernel"]),
            np.asarray(params["G"]["conv"]["kernel"]),
        )
        return float(metrics["loss_dis"])

    # same initial rng: repetition 0 sees the same mask in both runs, so a
    # stale (reused) key would make the two values identical.
    assert run(1) != run(2)


def test_mcd_step_runs_with_vgg_trunk_dropout():
    """The real fcn8s_vgg16 G (two Dropout(0.5) layers) through the fused MCD
    step: losses finite, params move, dropout rngs threaded correctly."""
    from mcseg_tpu.core.config import ModelConfig
    from mcseg_tpu.models.factory import get_models, init_models
    from mcseg_tpu.train.state import create_train_state

    mcfg = ModelConfig(net="fcn8s_vgg16", input_ch=3, n_class=NC, dtype="float32")
    tcfg = TrainConfig(lr=0.01, num_k=2, lr_schedule="constant")
    state, tx_g, tx_f = create_train_state(mcfg, tcfg, jax.random.key(0),
                                           img_shape=(32, 32))
    g, f1, f2 = get_models(mcfg)
    step = jax.jit(make_mcd_step(g, f1, f2, tx_g, tx_f, tcfg))
    rng = np.random.RandomState(1)
    src = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    lbl = jnp.asarray(rng.randint(0, NC, (2, 32, 32)))
    tgt = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    before = np.asarray(jax.tree.leaves(state.params["G"])[0]).copy()
    new_state, metrics = step(state, src, lbl, tgt)
    for k in ("loss_source", "loss_b", "loss_dis"):
        assert np.isfinite(float(metrics[k])), k
    after = np.asarray(jax.tree.leaves(new_state.params["G"])[0])
    assert not np.array_equal(before, after)
