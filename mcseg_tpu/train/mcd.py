"""MCD adaptation train step — the centerpiece.

Counterpart of the reference's ``adapt_trainer.py`` inner loop (SURVEY.md
section 3.2), the alternating 3-step Maximum-Classifier-Discrepancy min-max
(Saito et al., CVPR 2018):

  STEP A  minimize CE(F1(G(xs)), ys) + CE(F2(G(xs)), ys)      wrt G, F1, F2
  STEP B  minimize CE terms  -  d(F1(G(xt)), F2(G(xt)))        wrt F1, F2 only
  STEP C  minimize d(F1(G(xt)), F2(G(xt)))                     wrt G only,
          repeated num_k times with a fresh forward each time

The reference realizes the "only" constraints with the PyTorch idiom of
zeroing both optimizers and stepping one. TPU-native realization: the whole
A/B/C(xK) sequence is ONE jit-compiled function; the freeze constraints are
expressed by differentiating only the relevant parameter subtree (``jax.grad``
over a sub-pytree closure), and step C's num_k repetitions are a
``lax.scan`` carrying (G params, opt_g state, batch stats). Per training
iteration this performs 2 + 2 + 2*num_k generator forwards (+ backwards where
required) exactly like the reference, but fused into a single XLA program:
no Python between sub-steps, one dispatch per iteration, and with the batch
sharded over the 'data' mesh axis every gradient is psum-reduced over ICI
inside the same program.

BatchNorm statistics advance in every forward pass in trace order
(A: xs -> B: xs, xt -> C: xt * num_k), matching the reference where G stays in
.train() mode throughout (SURVEY.md section 7, hard part (a)).

``uses_one_classifier`` (reference ablation flag): F2's parameters are tied to
F1 at step time; the discrepancy is then 0 and training degrades to
source-supervision, mirroring the reference ablation's behavior.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from mcseg_tpu.core.config import TrainConfig
from mcseg_tpu.losses.discrepancy import get_prob_distance_criterion
from mcseg_tpu.losses.seg import cross_entropy_2d
from mcseg_tpu.train.apply import apply_classifier, apply_generator
from mcseg_tpu.train.optim import make_lr_schedule, set_lr
from mcseg_tpu.train.state import MCDTrainState

# Step C unrolling: the scan keeps ONE copy of the loop body in the program
# (fast compiles); unrolling lets XLA pipeline/fuse across repetitions.
# Measured on v5e (see docs/ARCHITECTURE.md); MCSEG_STEP_C_UNROLL=0 reverts.
import os as _os

_STEP_C_UNROLL = _os.environ.get("MCSEG_STEP_C_UNROLL", "1") == "1"


def make_mcd_step(
    g, f1, f2, tx_g, tx_f, cfg: TrainConfig, uses_one_classifier: bool = False
) -> Callable:
    disc = get_prob_distance_criterion(cfg.d_loss)
    lr_fn = make_lr_schedule(cfg.lr_schedule, cfg.lr, cfg.max_steps, cfg.lr_power)
    num_k = cfg.num_k

    def step(
        state: MCDTrainState,
        src_img: jnp.ndarray,  # [B, H, W, C]
        src_label: jnp.ndarray,  # [B, H, W]
        tgt_img: jnp.ndarray,  # [B, H, W, C]
    ):
        rng, ka, kb1, kb2, kc = jax.random.split(state.rng, 5)
        lr = lr_fn(state.step)
        opt_g = set_lr(state.opt_g, lr)
        opt_f = set_lr(state.opt_f, lr)

        def tie(pf2, pf1):
            return jax.tree.map(lambda a, _: a, pf1, pf2) if uses_one_classifier else pf2

        # ---------------- STEP A: source supervision, update G + F1 + F2 ----
        def loss_a(params):
            feat, new_sg = apply_generator(
                g, params["G"], state.batch_stats["G"], src_img, True, ka
            )
            o1 = apply_classifier(f1, params["F1"], feat, True)
            o2 = apply_classifier(f2, tie(params["F2"], params["F1"]), feat, True)
            loss = cross_entropy_2d(o1, src_label) + cross_entropy_2d(o2, src_label)
            return loss, new_sg

        (l_a, sg), grads = jax.value_and_grad(loss_a, has_aux=True)(state.params)
        up_g, opt_g = tx_g.update(grads["G"], opt_g, state.params["G"])
        pg = optax.apply_updates(state.params["G"], up_g)
        pf = {"F1": state.params["F1"], "F2": state.params["F2"]}
        up_f, opt_f = tx_f.update({"F1": grads["F1"], "F2": grads["F2"]}, opt_f, pf)
        pf = optax.apply_updates(pf, up_f)

        # ------- STEP B: maximize discrepancy wrt classifiers (G frozen) ----
        def loss_b(pf_, sg_):
            feat_s, sg_ = apply_generator(g, pg, sg_, src_img, True, kb1)
            feat_t, sg_ = apply_generator(g, pg, sg_, tgt_img, True, kb2)
            o1s = apply_classifier(f1, pf_["F1"], feat_s, True)
            o2s = apply_classifier(f2, tie(pf_["F2"], pf_["F1"]), feat_s, True)
            o1t = apply_classifier(f1, pf_["F1"], feat_t, True)
            o2t = apply_classifier(f2, tie(pf_["F2"], pf_["F1"]), feat_t, True)
            loss = (
                cross_entropy_2d(o1s, src_label)
                + cross_entropy_2d(o2s, src_label)
                - disc(o1t, o2t)
            )
            return loss, sg_

        (l_b, sg), grads_f = jax.value_and_grad(loss_b, has_aux=True)(pf, sg)
        up_f, opt_f = tx_f.update(grads_f, opt_f, pf)
        pf = optax.apply_updates(pf, up_f)

        # ---- STEP C: minimize discrepancy wrt generator (F frozen), x num_k -
        def c_iter(carry, i):
            pg_, opt_g_, sg_ = carry
            # fresh dropout mask per repetition, like the reference's num_k
            # independent forwards (matters for trunks with dropout, e.g. VGG)
            kc_i = jax.random.fold_in(kc, i)

            def loss_c(pg_in, sg_in):
                feat_t, sg_in = apply_generator(g, pg_in, sg_in, tgt_img, True, kc_i)
                o1t = apply_classifier(f1, pf["F1"], feat_t, True)
                o2t = apply_classifier(f2, tie(pf["F2"], pf["F1"]), feat_t, True)
                return disc(o1t, o2t), sg_in

            (l_c, sg_), gg = jax.value_and_grad(loss_c, has_aux=True)(pg_, sg_)
            up, opt_g_ = tx_g.update(gg, opt_g_, pg_)
            pg_ = optax.apply_updates(pg_, up)
            return (pg_, opt_g_, sg_), l_c

        (pg, opt_g, sg), l_cs = jax.lax.scan(
            c_iter, (pg, opt_g, sg), jnp.arange(num_k),
            unroll=_STEP_C_UNROLL,
        )

        new_state = state.replace(
            step=state.step + 1,
            params={"G": pg, "F1": pf["F1"], "F2": pf["F2"]},
            batch_stats={**state.batch_stats, "G": sg},
            opt_g=opt_g,
            opt_f=opt_f,
            rng=rng,
        )
        metrics = {
            "loss_source": l_a,
            "loss_b": l_b,
            "loss_dis": l_cs[-1],
            "lr": lr,
        }
        return new_state, metrics

    return step
