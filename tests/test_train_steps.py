"""Train-step semantics: source-only loss decreases; MCD's 3-step freeze
semantics (B leaves G untouched, C leaves F untouched); one-classifier
ablation; optimizer parity with torch SGD (SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch

from mcseg_tpu.core.config import ModelConfig, TrainConfig
from mcseg_tpu.models.factory import get_models
from mcseg_tpu.train.mcd import make_mcd_step
from mcseg_tpu.train.optim import get_optimizer, make_lr_schedule, set_lr
from mcseg_tpu.train.source import make_source_step
from mcseg_tpu.train.state import create_train_state

HW = (16, 16)
NCLASS = 5


def _setup(train_cfg=None, **model_kw):
    mcfg = ModelConfig(net="drn_d_22", input_ch=3, n_class=NCLASS, dtype="float32", **model_kw)
    tcfg = train_cfg or TrainConfig(lr=0.01, num_k=2, max_steps=100)
    state, tx_g, tx_f = create_train_state(mcfg, tcfg, jax.random.key(0), img_shape=HW)
    g, f1, f2 = get_models(mcfg)
    return mcfg, tcfg, state, tx_g, tx_f, g, f1, f2


def _batch(seed=0, b=2):
    rng = np.random.RandomState(seed)
    img = jnp.asarray(rng.rand(b, *HW, 3).astype(np.float32))
    label = jnp.asarray(rng.randint(0, NCLASS, size=(b, *HW)))
    return img, label


def test_source_step_decreases_loss():
    _, tcfg, state, tx_g, tx_f, g, f1, f2 = _setup(
        train_cfg=TrainConfig(lr=0.05, lr_schedule="constant", max_steps=100)
    )
    step = jax.jit(make_source_step(g, f1, f2, tx_g, tx_f, tcfg))
    img, label = _batch()
    losses = []
    for _ in range(8):
        state, metrics = step(state, img, label)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_mcd_step_runs_and_updates_everything():
    _, tcfg, state, tx_g, tx_f, g, f1, f2 = _setup()
    step = jax.jit(make_mcd_step(g, f1, f2, tx_g, tx_f, tcfg))
    xs, ys = _batch(0)
    xt, _ = _batch(1)
    p0 = jax.tree.map(lambda x: x.copy(), state.params)
    state, metrics = step(state, xs, ys, xt)
    for k in ("loss_source", "loss_b", "loss_dis", "lr"):
        assert np.isfinite(float(metrics[k])), (k, metrics[k])

    def changed(a, b):
        return any(
            not np.allclose(np.asarray(x), np.asarray(y))
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )

    assert changed(p0["G"], state.params["G"])
    assert changed(p0["F1"], state.params["F1"])
    assert changed(p0["F2"], state.params["F2"])


def test_mcd_discrepancy_shrinks_over_steps():
    """Step C explicitly minimizes the discrepancy wrt G — on a fixed batch the
    reported discrepancy should trend down."""
    _, tcfg, state, tx_g, tx_f, g, f1, f2 = _setup(
        train_cfg=TrainConfig(lr=0.02, num_k=4, lr_schedule="constant", max_steps=100)
    )
    step = jax.jit(make_mcd_step(g, f1, f2, tx_g, tx_f, tcfg))
    xs, ys = _batch(0)
    xt, _ = _batch(1)
    first = last = None
    for i in range(6):
        state, metrics = step(state, xs, ys, xt)
        if i == 0:
            first = float(metrics["loss_dis"])
        last = float(metrics["loss_dis"])
    assert last <= first * 1.05, (first, last)


def test_mcd_one_classifier_keeps_f2_equal_to_f2_init():
    """uses_one_classifier ties F2:=F1 inside the step; F2's own params then
    receive zero gradient and only weight-decay drift (none at wd=0)."""
    tcfg = TrainConfig(lr=0.01, num_k=1, weight_decay=0.0, max_steps=100)
    _, _, state, tx_g, tx_f, g, f1, f2 = _setup(train_cfg=tcfg, uses_one_classifier=True)
    step = jax.jit(make_mcd_step(g, f1, f2, tx_g, tx_f, tcfg, uses_one_classifier=True))
    xs, ys = _batch(0)
    xt, _ = _batch(1)
    f2_before = jax.tree.map(lambda x: np.asarray(x).copy(), state.params["F2"])
    state, _ = step(state, xs, ys, xt)
    for a, b in zip(jax.tree.leaves(f2_before), jax.tree.leaves(state.params["F2"])):
        np.testing.assert_allclose(a, np.asarray(b), atol=1e-7)


def test_mcd_one_classifier_behaves_like_single_classifier_training():
    """uses_one_classifier behavioral semantics through a REAL make_mcd_step
    call (VERDICT r2 #6): the reported discrepancy is exactly 0, and one full
    A/B/C iteration equals a hand-built mirror step that only ever owns ONE
    classifier — i.e. training genuinely degrades to source supervision
    (reference ablation: F1 and F2 are the same module, so the discrepancy
    term vanishes and only the CE terms train anything)."""
    from mcseg_tpu.train.apply import apply_classifier, apply_generator
    from mcseg_tpu.train.state import MCDTrainState

    tcfg = TrainConfig(lr=0.01, num_k=2, momentum=0.9, weight_decay=5e-4,
                       lr_schedule="constant", max_steps=100)
    _, _, state, tx_g, tx_f, g, f1, f2 = _setup(
        train_cfg=tcfg, uses_one_classifier=True)
    step = jax.jit(make_mcd_step(g, f1, f2, tx_g, tx_f, tcfg,
                                 uses_one_classifier=True))
    xs, ys = _batch(0)
    xt, _ = _batch(1)

    from mcseg_tpu.losses.seg import cross_entropy_2d

    # --- hand-built mirror: a 3-step MCD iteration written with ONLY F1 ----
    def mirror_step(st: MCDTrainState):
        rng, ka, kb1, kb2, kc = jax.random.split(st.rng, 5)
        del kc
        opt_g, opt_f = st.opt_g, st.opt_f  # constant schedule: lr unchanged
        zero_f2 = jax.tree.map(jnp.zeros_like, st.params["F2"])

        # STEP A: the single classifier sees the features twice -> 2*CE
        def loss_a(params):
            feat, sg = apply_generator(
                g, params["G"], st.batch_stats["G"], xs, True, ka)
            o1 = apply_classifier(f1, params["F1"], feat, True)
            return 2.0 * cross_entropy_2d(o1, ys), sg

        (_, sg), grads = jax.value_and_grad(loss_a, has_aux=True)(st.params)
        up_g, opt_g = tx_g.update(grads["G"], opt_g, st.params["G"])
        pg = optax.apply_updates(st.params["G"], up_g)
        pf = {"F1": st.params["F1"], "F2": st.params["F2"]}
        up_f, opt_f = tx_f.update(
            {"F1": grads["F1"], "F2": zero_f2}, opt_f, pf)
        pf = optax.apply_updates(pf, up_f)

        # STEP B: discrepancy(o, o) == 0, leaving only the CE terms; the
        # target forward still advances BN stats (reference .train() mode)
        def loss_b(pf1, sg_):
            feat_s, sg_ = apply_generator(g, pg, sg_, xs, True, kb1)
            feat_t, sg_ = apply_generator(g, pg, sg_, xt, True, kb2)
            del feat_t  # consumed only by BN stats; disc term is identically 0
            o1s = apply_classifier(f1, pf1, feat_s, True)
            return 2.0 * cross_entropy_2d(o1s, ys), sg_

        (_, sg), gf1 = jax.value_and_grad(loss_b, has_aux=True)(pf["F1"], sg)
        up_f, opt_f = tx_f.update({"F1": gf1, "F2": zero_f2}, opt_f, pf)
        pf = optax.apply_updates(pf, up_f)

        # STEP C x num_k: loss == 0 -> zero G-grads, but the optimizer still
        # steps (momentum/weight-decay apply) and BN still advances on xt —
        # exactly what the reference's zero_grad/backward(0)/step() does
        def loss_c(pg_, sg_):
            feat_t, sg_ = apply_generator(g, pg_, sg_, xt, True, None)
            del feat_t
            return jnp.zeros((), jnp.float32), sg_

        for _ in range(tcfg.num_k):
            (_, sg), gg = jax.value_and_grad(loss_c, has_aux=True)(pg, sg)
            up, opt_g = tx_g.update(gg, opt_g, pg)
            pg = optax.apply_updates(pg, up)

        return st.replace(step=st.step + 1,
                          params={"G": pg, "F1": pf["F1"], "F2": pf["F2"]},
                          batch_stats={**st.batch_stats, "G": sg},
                          opt_g=opt_g, opt_f=opt_f, rng=rng)

    want = jax.jit(mirror_step)(state)
    got, metrics = step(state, xs, ys, xt)

    # discrepancy is identically 0 through the real step
    assert float(metrics["loss_dis"]) == 0.0
    # loss_b has no negative discrepancy contribution: pure CE, positive
    assert float(metrics["loss_b"]) > 0.0

    # the real tied step == genuine single-classifier training, exactly
    for name in ("params", "batch_stats"):
        for a, b in zip(jax.tree.leaves(getattr(want, name)),
                        jax.tree.leaves(getattr(got, name))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, rtol=1e-6)


def test_sgd_matches_torch_two_steps():
    """Our optax chain == torch.optim.SGD(momentum, weight_decay) bit-for-bit
    over two updates on a quadratic."""
    w0 = np.array([1.5, -2.0, 0.5], np.float32)
    lr, mom, wd = 0.1, 0.9, 0.01

    tw = torch.tensor(w0.copy(), requires_grad=True)
    topt = torch.optim.SGD([tw], lr=lr, momentum=mom, weight_decay=wd)
    for _ in range(2):
        topt.zero_grad()
        (0.5 * (tw**2).sum()).backward()
        topt.step()

    tx = get_optimizer("sgd", lr=lr, momentum=mom, weight_decay=wd)
    w = jnp.asarray(w0)
    opt_state = tx.init(w)
    for _ in range(2):
        gradient = w  # d/dw 0.5 w^2
        updates, opt_state = tx.update(gradient, opt_state, w)
        w = optax.apply_updates(w, updates)
    np.testing.assert_allclose(np.asarray(w), tw.detach().numpy(), rtol=1e-6)


def test_poly_lr_schedule():
    sch = make_lr_schedule("poly", 0.01, 100, 0.9)
    assert float(sch(jnp.asarray(0))) == pytest.approx(0.01)
    assert float(sch(jnp.asarray(100))) == pytest.approx(0.0)
    assert float(sch(jnp.asarray(50))) == pytest.approx(0.01 * 0.5**0.9, rel=1e-5)


def test_set_lr_overrides():
    tx = get_optimizer("sgd", lr=0.5)
    st = tx.init(jnp.zeros(3))
    st = set_lr(st, jnp.asarray(0.125))
    assert float(st.hyperparams["learning_rate"]) == 0.125


@pytest.mark.slow
def test_mcd_step_runs_with_psp_trunk():
    """--net psp through the fused MCD step (dilated R50 + PPM generator)."""
    mcfg = ModelConfig(net="psp", input_ch=3, n_class=NCLASS, dtype="float32")
    tcfg = TrainConfig(lr=0.01, num_k=1, lr_schedule="constant", max_steps=10)
    state, tx_g, tx_f = create_train_state(mcfg, tcfg, jax.random.key(0),
                                           img_shape=(32, 32))
    g, f1, f2 = get_models(mcfg)
    step = jax.jit(make_mcd_step(g, f1, f2, tx_g, tx_f, tcfg))
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    ys = jnp.asarray(rng.randint(0, NCLASS, (2, 32, 32)))
    xt = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    new_state, m = step(state, xs, ys, xt)
    for k in ("loss_source", "loss_b", "loss_dis"):
        assert np.isfinite(float(m[k])), k
