"""Source-only supervised train step.

Counterpart of the reference's ``source_trainer.py`` inner loop (SURVEY.md
section 3.1): out = F1(G(img)); CE loss with ignore_index; SGD step; poly LR.
The reference also builds F2 and trains it alongside F1 in some configs; we
supervise both classifiers (harmless for single-head eval, required for
seeding MCD adaptation from a source-only checkpoint).

One call = one optimizer update, entirely inside jit; with batch sharded over
the 'data' mesh axis, XLA inserts the gradient all-reduce (psum over ICI)
automatically from the replicated-param / sharded-batch annotations.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from mcseg_tpu.core.config import TrainConfig
from mcseg_tpu.losses.seg import cross_entropy_2d
from mcseg_tpu.train.apply import apply_classifier, apply_generator
from mcseg_tpu.train.optim import make_lr_schedule, set_lr
from mcseg_tpu.train.state import MCDTrainState


def make_source_step(g, f1, f2, tx_g, tx_f, cfg: TrainConfig) -> Callable:
    lr_fn = make_lr_schedule(cfg.lr_schedule, cfg.lr, cfg.max_steps, cfg.lr_power)

    def step(state: MCDTrainState, img: jnp.ndarray, label: jnp.ndarray):
        rng, drop_rng = jax.random.split(state.rng)
        lr = lr_fn(state.step)

        def loss_fn(params):
            feat, new_sg = apply_generator(
                g, params["G"], state.batch_stats["G"], img, True, drop_rng
            )
            o1 = apply_classifier(f1, params["F1"], feat, True)
            o2 = apply_classifier(f2, params["F2"], feat, True)
            loss = cross_entropy_2d(o1, label) + cross_entropy_2d(o2, label)
            return loss, new_sg

        (loss, new_sg), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)

        opt_g = set_lr(state.opt_g, lr)
        opt_f = set_lr(state.opt_f, lr)
        up_g, opt_g = tx_g.update(grads["G"], opt_g, state.params["G"])
        pf = {"F1": state.params["F1"], "F2": state.params["F2"]}
        up_f, opt_f = tx_f.update({"F1": grads["F1"], "F2": grads["F2"]}, opt_f, pf)
        new_pg = optax.apply_updates(state.params["G"], up_g)
        new_pf = optax.apply_updates(pf, up_f)

        new_state = state.replace(
            step=state.step + 1,
            params={"G": new_pg, "F1": new_pf["F1"], "F2": new_pf["F2"]},
            batch_stats={**state.batch_stats, "G": new_sg},
            opt_g=opt_g,
            opt_f=opt_f,
            rng=rng,
        )
        metrics = {"loss": loss, "lr": lr}
        return new_state, metrics

    return step
