"""Convergence A/B: production-bf16 jax MCD vs the torch-fp32 reference loop
(VERDICT r2 next-round #1b).

tests/test_trajectory_parity.py pins exact short-horizon dynamics at fp64;
this test asks the production question: does bf16 jax TRAINING reach the same
end-state quality as the torch fp32 loop?  Both frameworks run the identical
MCD adaptation problem — same initial weights, same 200-iteration batch
sequence from the same synthetic source/target corpora (augmentation
disabled), same poly LR — and the final target-domain mIoUs must agree within
the trajectory-noise yardstick, measured IN this test as the spread between
two jax runs that differ only in initialization seed.

Task design: source domain = class-colored rectangle scenes; target domain =
the same scene DISTRIBUTION under a global color shift + stronger noise (a
real, learnable domain gap at this scale). 5 classes, 32x32, DRN-D-22 with
the reference's fixed-bilinear 'convt' decoder.
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
from tests.test_golden_drn import TorchDRND22
from tests.test_mcd_full_trunk_parity import TorchF8, _ce, _disc, _import_all

B, H, W, NC = 4, 32, 32, 5
ITERS = 200
LR, MOM, NUM_K = 0.02, 0.9, 2
N_IMGS = 16


def _scene(rng, shift, noise):
    """Class-colored rectangle scene; `shift`/`noise` set the domain."""
    label = np.ones((H, W), np.int64)  # class 1 = background
    for _ in range(rng.randint(3, 6)):
        cls = rng.randint(1, NC)
        bw, bh = rng.randint(W // 6, W // 2), rng.randint(H // 6, H // 2)
        x0, y0 = rng.randint(0, W - bw), rng.randint(0, H - bh)
        label[y0:y0 + bh, x0:x0 + bw] = cls
    base = (np.arange(NC)[:, None] * np.array([[61, 113, 191]]) + 40) % 255
    img = base[label].astype(np.float64) + shift
    img += rng.randn(H, W, 3) * noise
    return (np.clip(img, 0, 255) / 255.0).astype(np.float32), label


def _corpus(seed, shift, noise, n):
    rng = np.random.RandomState(seed)
    imgs, labels = zip(*[_scene(rng, shift, noise) for _ in range(n)])
    return np.stack(imgs), np.stack(labels)


@pytest.fixture(scope="module")
def ab_problem():
    """(source corpus, target corpus, target val, batch index sequence)."""
    src_x, src_y = _corpus(0, shift=0.0, noise=6.0, n=N_IMGS)
    tgt_x, _ = _corpus(1, shift=np.array([25.0, -20.0, 12.0]), noise=14.0,
                       n=N_IMGS)
    val_x, val_y = _corpus(2, shift=np.array([25.0, -20.0, 12.0]), noise=14.0,
                           n=N_IMGS)
    order = np.random.RandomState(3)
    batches = [(order.randint(0, N_IMGS, B), order.randint(0, N_IMGS, B))
               for _ in range(ITERS)]
    return src_x, src_y, tgt_x, val_x, val_y, batches


def _miou(pred, gt):
    valid = gt != 255
    hist = np.bincount(
        NC * gt[valid].astype(np.int64) + pred[valid], minlength=NC * NC
    ).reshape(NC, NC)
    iou = np.diag(hist) / np.maximum(
        hist.sum(0) + hist.sum(1) - np.diag(hist), 1)
    present = (hist.sum(1) > 0)
    return float(iou[present].mean())


def _train_eval_jax(ab, init_sds):
    src_x, src_y, tgt_x, val_x, val_y, batches = ab
    cfg = ModelConfig(net="drn_d_22", input_ch=3, n_class=NC,
                      dtype="bfloat16", upsample="convt")
    variables = init_models(cfg, jax.random.key(0), img_shape=(H, W))
    params, sg = _import_all(*init_sds, variables)
    tcfg = TrainConfig(opt="sgd", lr=LR, momentum=MOM, weight_decay=0.0,
                       num_k=NUM_K, d_loss="diff", lr_schedule="poly",
                       lr_power=0.9, max_steps=ITERS)
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
    for si, ti in batches:
        state, m = step(state, jnp.asarray(src_x[si]),
                        jnp.asarray(src_y[si]), jnp.asarray(tgt_x[ti]))
    assert np.isfinite(float(m["loss_source"]))

    gv = {"params": state.params["G"], "batch_stats": state.batch_stats["G"]}
    feat = g.apply(gv, jnp.asarray(val_x), False)
    logits = 0.5 * (
        f1.apply({"params": state.params["F1"]}, feat, False)
        + f2.apply({"params": state.params["F2"]}, feat, False))
    return _miou(np.asarray(jnp.argmax(logits, -1)), val_y)


def _train_eval_torch(ab, modules):
    src_x, src_y, tgt_x, val_x, val_y, batches = ab
    tg, tf1, tf2 = modules
    for m in (tg, tf1, tf2):
        m.train()
    opt_g = torch.optim.SGD(tg.parameters(), lr=LR, momentum=MOM)
    f_params = [p for p in list(tf1.parameters()) + list(tf2.parameters())
                if p.requires_grad]
    opt_f = torch.optim.SGD(f_params, lr=LR, momentum=MOM)
    for i, (si, ti) in enumerate(batches):
        lr = LR * (1.0 - min(i / ITERS, 1.0)) ** 0.9
        for opt in (opt_g, opt_f):
            for gparam in opt.param_groups:
                gparam["lr"] = lr
        t_xs = torch.from_numpy(src_x[si]).permute(0, 3, 1, 2)
        t_xt = torch.from_numpy(tgt_x[ti]).permute(0, 3, 1, 2)
        t_ys = torch.from_numpy(src_y[si])

        opt_g.zero_grad(); opt_f.zero_grad()
        feat = tg(t_xs)
        (_ce(tf1(feat), t_ys) + _ce(tf2(feat), t_ys)).backward()
        opt_g.step(); opt_f.step()

        opt_g.zero_grad(); opt_f.zero_grad()
        feat_s = tg(t_xs); feat_t = tg(t_xt)
        (_ce(tf1(feat_s), t_ys) + _ce(tf2(feat_s), t_ys)
         - _disc(tf1(feat_t), tf2(feat_t))).backward()
        opt_f.step()

        for _ in range(NUM_K):
            opt_g.zero_grad(); opt_f.zero_grad()
            feat_t = tg(t_xt)
            _disc(tf1(feat_t), tf2(feat_t)).backward()
            opt_g.step()

    for m in (tg, tf1, tf2):
        m.eval()
    with torch.no_grad():
        feat = tg(torch.from_numpy(val_x).permute(0, 3, 1, 2))
        logits = 0.5 * (tf1(feat) + tf2(feat))
    return _miou(logits.numpy().argmax(1), val_y)


def _fresh_modules(seed):
    torch.manual_seed(seed)
    return TorchDRND22(), TorchF8(n_class=NC), TorchF8(n_class=NC)


@pytest.mark.slow
def test_bf16_jax_vs_fp32_torch_convergence(ab_problem):
    mods_a = _fresh_modules(0)
    init_sds = tuple(copy.deepcopy(m.state_dict()) for m in mods_a)
    miou_jax = _train_eval_jax(ab_problem, init_sds)

    mods_b = _fresh_modules(7)
    init_sds_b = tuple(copy.deepcopy(m.state_dict()) for m in mods_b)
    miou_jax_seed2 = _train_eval_jax(ab_problem, init_sds_b)

    miou_torch = _train_eval_torch(ab_problem, mods_a)

    # both stacks actually learned the task (chance ~ 1/NC on boxes)
    assert miou_jax > 0.35, (miou_jax, miou_torch)
    assert miou_torch > 0.35, (miou_jax, miou_torch)

    # A/B criterion: bf16-jax vs fp32-torch from the SAME init agree within
    # the trajectory-noise yardstick — the init-seed spread of the jax run
    # itself — plus a floor for the yardstick's own sampling noise.
    spread = abs(miou_jax - miou_jax_seed2)
    gap = abs(miou_jax - miou_torch)
    assert gap <= max(2.0 * spread, 0.08), {
        "jax": miou_jax, "jax_seed2": miou_jax_seed2, "torch": miou_torch,
        "gap": gap, "seed_spread": spread,
    }
