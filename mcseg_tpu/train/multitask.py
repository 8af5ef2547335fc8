"""Multitask trainer step: segmentation + auxiliary depth estimation
(+ optional auxiliary boundary detection).

The reference's third fusion mode (SURVEY.md section 2 'multitask trainer
[?]', paper arXiv:1812.04351 [P]): the generator G is shared between the
segmentation classifier(s) and auxiliary heads — a depth-regression head
(predicting depth from RGB regularizes G's features for the RGB+D domain)
and, per the survey's "(and/or boundary)" recall, an optional
boundary-detection head. Loss = CE(seg) + w_d * berHu(depth)
[+ w_b * balancedBCE(boundary)]. Implemented both source-only and as an MCD
variant (the discrepancy game unchanged; aux heads train in step A).
Boundary targets are derived on device from the source label map
(losses/seg.py:boundary_targets_from_labels) — no extra input plane.

To keep checkpoints honest the depth head gets its own subtree 'D' (and the
boundary head 'B' when enabled) carried in params; opt_f covers
{F1, F2, D[, B]}.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax

from mcseg_tpu.core.config import ModelConfig, TrainConfig
from mcseg_tpu.losses.discrepancy import get_prob_distance_criterion
from mcseg_tpu.losses.seg import (
    balanced_bce_2d,
    berhu_loss,
    boundary_targets_from_labels,
    cross_entropy_2d,
)
from mcseg_tpu.models.factory import _dtype_of, get_models, init_models
from mcseg_tpu.models.heads import BoundaryDetector, DepthRegressor
from mcseg_tpu.train.apply import apply_classifier, apply_generator
from mcseg_tpu.train.optim import get_optimizer, make_lr_schedule, set_lr
from mcseg_tpu.train.state import MCDTrainState


def aux_param_keys(params) -> Tuple[str, ...]:
    """The classifier-side subtrees opt_f covers, in checkpoint order."""
    return tuple(k for k in ("F1", "F2", "D", "B") if k in params)


def init_multitask_state(
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    rng: jax.Array,
    img_shape: Tuple[int, int] = (64, 64),
    with_boundary: bool = False,
):
    """Like create_train_state but with a depth head 'D' (and optionally a
    boundary head 'B') in the param tree."""
    k_init, k_d, k_b, k_state = jax.random.split(rng, 4)
    variables = init_models(model_cfg, k_init, img_shape=img_shape)
    g, _, _ = get_models(model_cfg)
    d_head = DepthRegressor(upsample=model_cfg.upsample,
                            dtype=_dtype_of(model_cfg))
    x = jnp.zeros((1, *img_shape, model_cfg.input_ch), jnp.float32)
    gv = {"params": variables["params"]["G"]}
    if variables["batch_stats"]["G"]:
        gv["batch_stats"] = variables["batch_stats"]["G"]
    feat = g.apply(gv, x, False)
    dv = d_head.init({"params": k_d}, feat, False)

    params = dict(variables["params"])
    params["D"] = dv["params"]
    if with_boundary:
        b_head = BoundaryDetector(upsample=model_cfg.upsample,
                                  dtype=_dtype_of(model_cfg))
        params["B"] = b_head.init({"params": k_b}, feat, False)["params"]
    tx_g = get_optimizer(train_cfg.opt, train_cfg.lr, train_cfg.momentum,
                         train_cfg.weight_decay)
    tx_f = get_optimizer(train_cfg.opt, train_cfg.lr, train_cfg.momentum,
                         train_cfg.weight_decay)
    state = MCDTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables["batch_stats"],
        opt_g=tx_g.init(params["G"]),
        opt_f=tx_f.init({k: params[k] for k in aux_param_keys(params)}),
        rng=k_state,
    )
    return state, tx_g, tx_f, d_head


def _aux_losses(params, feat, label, depth, d_head, b_head,
                depth_weight, boundary_weight):
    """Auxiliary-head losses on a supervised (source) batch: berHu depth
    regression, plus class-balanced BCE boundary detection when a boundary
    head is present (targets derived on device from the label map)."""
    d_pred = d_head.apply({"params": params["D"]}, feat, True)
    dep = berhu_loss(d_pred, depth)
    total = depth_weight * dep
    bnd = jnp.zeros((), jnp.float32)
    if b_head is not None:
        b_logits = b_head.apply({"params": params["B"]}, feat, True)
        b_tgt, b_valid = boundary_targets_from_labels(label)
        bnd = balanced_bce_2d(b_logits, b_tgt, b_valid)
        total = total + boundary_weight * bnd
    return total, dep, bnd


def make_multitask_source_step(
    g, f1, f2, d_head, tx_g, tx_f, cfg: TrainConfig, depth_weight: float = 0.5,
    b_head=None, boundary_weight: float = 0.0,
) -> Callable:
    """Supervised multitask step: CE(F1) + CE(F2) + w_d * berHu(depth)
    [+ w_b * balancedBCE(boundary)]."""
    lr_fn = make_lr_schedule(cfg.lr_schedule, cfg.lr, cfg.max_steps, cfg.lr_power)

    def step(state: MCDTrainState, img, label, depth):
        rng, drop_rng = jax.random.split(state.rng)
        lr = lr_fn(state.step)
        keys = aux_param_keys(state.params)

        def loss_fn(params):
            feat, new_sg = apply_generator(
                g, params["G"], state.batch_stats["G"], img, True, drop_rng
            )
            o1 = apply_classifier(f1, params["F1"], feat, True)
            o2 = apply_classifier(f2, params["F2"], feat, True)
            seg = cross_entropy_2d(o1, label) + cross_entropy_2d(o2, label)
            aux, dep, bnd = _aux_losses(params, feat, label, depth, d_head,
                                        b_head, depth_weight, boundary_weight)
            return seg + aux, (new_sg, seg, dep, bnd)

        (loss, (new_sg, seg, dep, bnd)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        opt_g = set_lr(state.opt_g, lr)
        opt_f = set_lr(state.opt_f, lr)
        up_g, opt_g = tx_g.update(grads["G"], opt_g, state.params["G"])
        pf = {k: state.params[k] for k in keys}
        gf = {k: grads[k] for k in keys}
        up_f, opt_f = tx_f.update(gf, opt_f, pf)
        new_pg = optax.apply_updates(state.params["G"], up_g)
        new_pf = optax.apply_updates(pf, up_f)

        new_state = state.replace(
            step=state.step + 1,
            params={"G": new_pg, **new_pf},
            batch_stats={**state.batch_stats, "G": new_sg},
            opt_g=opt_g,
            opt_f=opt_f,
            rng=rng,
        )
        metrics = {"loss": loss, "loss_seg": seg, "loss_depth": dep, "lr": lr}
        if b_head is not None:
            metrics["loss_boundary"] = bnd
        return new_state, metrics

    return step


def make_multitask_mcd_step(
    g, f1, f2, d_head, tx_g, tx_f, cfg: TrainConfig, depth_weight: float = 0.5,
    b_head=None, boundary_weight: float = 0.0,
) -> Callable:
    """MCD A/B/C with the aux tasks folded into step A (source supervision).

    Steps B/C are the plain discrepancy game — depth/boundary supervision
    exists only on the source domain, so only step A touches the aux heads.
    """
    disc = get_prob_distance_criterion(cfg.d_loss)
    lr_fn = make_lr_schedule(cfg.lr_schedule, cfg.lr, cfg.max_steps, cfg.lr_power)

    def step(state: MCDTrainState, src_img, src_label, src_depth, tgt_img):
        rng, ka, kb1, kb2, kc = jax.random.split(state.rng, 5)
        lr = lr_fn(state.step)
        opt_g = set_lr(state.opt_g, lr)
        opt_f = set_lr(state.opt_f, lr)
        keys = aux_param_keys(state.params)

        # STEP A + aux tasks
        def loss_a(params):
            feat, new_sg = apply_generator(
                g, params["G"], state.batch_stats["G"], src_img, True, ka
            )
            o1 = apply_classifier(f1, params["F1"], feat, True)
            o2 = apply_classifier(f2, params["F2"], feat, True)
            seg = cross_entropy_2d(o1, src_label) + cross_entropy_2d(o2, src_label)
            aux, dep, bnd = _aux_losses(params, feat, src_label, src_depth,
                                        d_head, b_head, depth_weight,
                                        boundary_weight)
            return seg + aux, (new_sg, seg, dep, bnd)

        (l_a, (sg, seg_a, dep_a, bnd_a)), grads = jax.value_and_grad(
            loss_a, has_aux=True
        )(state.params)
        up_g, opt_g = tx_g.update(grads["G"], opt_g, state.params["G"])
        pg = optax.apply_updates(state.params["G"], up_g)
        pf = {k: state.params[k] for k in keys}
        gf = {k: grads[k] for k in keys}
        up_f, opt_f = tx_f.update(gf, opt_f, pf)
        pf = optax.apply_updates(pf, up_f)

        # STEP B (classifiers only)
        def loss_b(pf_, sg_):
            feat_s, sg_ = apply_generator(g, pg, sg_, src_img, True, kb1)
            feat_t, sg_ = apply_generator(g, pg, sg_, tgt_img, True, kb2)
            o1s = apply_classifier(f1, pf_["F1"], feat_s, True)
            o2s = apply_classifier(f2, pf_["F2"], feat_s, True)
            o1t = apply_classifier(f1, pf_["F1"], feat_t, True)
            o2t = apply_classifier(f2, pf_["F2"], feat_t, True)
            loss = (
                cross_entropy_2d(o1s, src_label)
                + cross_entropy_2d(o2s, src_label)
                - disc(o1t, o2t)
            )
            return loss, sg_

        (l_b, sg), grads_f = jax.value_and_grad(loss_b, has_aux=True)(pf, sg)
        up_f, opt_f = tx_f.update(grads_f, opt_f, pf)
        pf = optax.apply_updates(pf, up_f)

        # STEP C (generator only, num_k times)
        def c_iter(carry, i):
            pg_, opt_g_, sg_ = carry
            kc_i = jax.random.fold_in(kc, i)  # fresh dropout per repetition

            def loss_c(p, s):
                feat_t, s = apply_generator(g, p, s, tgt_img, True, kc_i)
                o1t = apply_classifier(f1, pf["F1"], feat_t, True)
                o2t = apply_classifier(f2, pf["F2"], feat_t, True)
                return disc(o1t, o2t), s

            (l_c, sg_), gg = jax.value_and_grad(loss_c, has_aux=True)(pg_, sg_)
            up, opt_g_ = tx_g.update(gg, opt_g_, pg_)
            return (optax.apply_updates(pg_, up), opt_g_, sg_), l_c

        (pg, opt_g, sg), l_cs = jax.lax.scan(
            c_iter, (pg, opt_g, sg), jnp.arange(cfg.num_k)
        )

        new_state = state.replace(
            step=state.step + 1,
            params={"G": pg, **pf},
            batch_stats={**state.batch_stats, "G": sg},
            opt_g=opt_g,
            opt_f=opt_f,
            rng=rng,
        )
        metrics = {
            "loss_source": l_a, "loss_seg": seg_a, "loss_depth": dep_a,
            "loss_b": l_b, "loss_dis": l_cs[-1], "lr": lr,
        }
        if b_head is not None:
            metrics["loss_boundary"] = bnd_a
        return new_state, metrics

    return step
