"""Optimizer + LR-schedule factory.

Counterpart of the reference's ``get_optimizer(params, opt, lr, momentum,
weight_decay)`` and ``util.adjust_learning_rate`` (SURVEY.md section 2).
Semantics match torch:

  * sgd  : additive weight decay folded into the gradient *before* the
           momentum buffer (torch SGD), momentum trace, no Nesterov.
  * adam : additive weight decay before the moment estimates (torch Adam,
           NOT AdamW).
  * poly : lr = base * (1 - step / max_steps) ** power, stepped once per
           train iteration (the reference calls adjust_learning_rate per
           iteration), regardless of how many optimizer updates the MCD step
           performs internally.

The per-iteration schedule is injected through ``optax.inject_hyperparams`` —
the train step computes lr(step) and writes it into the optimizer state, so
the whole thing stays inside one jit.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import optax


# Schedules compute in the ambient float precision (jnp.result_type(float):
# float32 in production, float64 under the x64 oracle tests) so the fp64
# trajectory-parity oracle isn't limited by a float32 lr value.


def poly_lr(base_lr: float, max_steps: int, power: float = 0.9) -> Callable:
    def schedule(step):
        frac = jnp.clip(step.astype(jnp.result_type(float)) / max_steps, 0.0, 1.0)
        return base_lr * (1.0 - frac) ** power

    return schedule


def step_lr(base_lr: float, step_size: int, gamma: float = 0.1) -> Callable:
    def schedule(step):
        return base_lr * gamma ** (step // step_size).astype(jnp.result_type(float))

    return schedule


def constant_lr(base_lr: float) -> Callable:
    def schedule(step):
        return jnp.asarray(base_lr, jnp.result_type(float))

    return schedule


def make_lr_schedule(
    kind: str, base_lr: float, max_steps: int, power: float = 0.9
) -> Callable:
    if kind == "poly":
        return poly_lr(base_lr, max_steps, power)
    if kind == "constant":
        return constant_lr(base_lr)
    if kind == "step":
        return step_lr(base_lr, max(max_steps // 3, 1))
    raise ValueError(f"unknown lr schedule {kind!r}")


def get_optimizer(
    opt: str = "sgd",
    lr: float = 1e-3,
    momentum: float = 0.9,
    weight_decay: float = 2e-5,
) -> optax.GradientTransformation:
    """Build an injectable-lr optimizer (torch-parity update rules)."""

    def _make(learning_rate):
        if opt == "sgd":
            return optax.chain(
                optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
                optax.trace(decay=momentum) if momentum else optax.identity(),
                optax.scale_by_learning_rate(learning_rate),
            )
        if opt == "adam":
            return optax.chain(
                optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
                optax.scale_by_adam(),
                optax.scale_by_learning_rate(learning_rate),
            )
        raise ValueError(f"unknown optimizer {opt!r} (options: sgd, adam)")

    return optax.inject_hyperparams(_make)(learning_rate=lr)


def set_lr(opt_state, lr):
    """Functionally override the injected learning rate inside a jit'd step."""
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = lr
    return opt_state._replace(hyperparams=hp)
