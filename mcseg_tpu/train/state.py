"""Train state containers.

The reference carries training state implicitly in mutable nn.Modules and two
torch optimizers (SURVEY.md section 3.2). Here it is one explicit pytree that
flows through the jit'd step with donated buffers:

  params      {'G', 'F1', 'F2'}       fp32 parameter pytrees
  batch_stats {'G', 'F1', 'F2'}       BatchNorm running statistics
  opt_g       optax state over params['G']
  opt_f       optax state over {'F1': ..., 'F2': ...}
  step        per-iteration counter driving the LR schedule
  rng         jax PRNG key (dropout in the VGG trunk, data augmentation)
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from mcseg_tpu.core.config import ModelConfig, TrainConfig
from mcseg_tpu.models.factory import init_models
from mcseg_tpu.train.optim import get_optimizer


@struct.dataclass
class MCDTrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_g: Any
    opt_f: Any
    rng: jax.Array


def create_train_state(
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    rng: jax.Array,
    img_shape: Tuple[int, int] = (64, 64),
) -> Tuple[MCDTrainState, optax.GradientTransformation, optax.GradientTransformation]:
    """Initialize params + both optimizers. Returns (state, tx_g, tx_f)."""
    k_init, k_state = jax.random.split(rng)
    variables = init_models(model_cfg, k_init, img_shape=img_shape)
    tx_g = get_optimizer(
        train_cfg.opt, train_cfg.lr, train_cfg.momentum, train_cfg.weight_decay
    )
    tx_f = get_optimizer(
        train_cfg.opt, train_cfg.lr, train_cfg.momentum, train_cfg.weight_decay
    )
    params = variables["params"]
    state = MCDTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables["batch_stats"],
        opt_g=tx_g.init(params["G"]),
        opt_f=tx_f.init({"F1": params["F1"], "F2": params["F2"]}),
        rng=k_state,
    )
    return state, tx_g, tx_f
