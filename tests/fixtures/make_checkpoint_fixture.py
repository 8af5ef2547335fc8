"""Generate the committed checkpoint-format fixture (run ONCE, then commit).

The fixture pins the on-disk checkpoint format of the round-3/4 era
(``{step, params{G,F1,F2}, batch_stats, opt_g, opt_f, rng}`` msgpack +
config JSON sidecar — utils/checkpoint.py) so that future format evolution
cannot silently orphan existing runs: tests/test_checkpoint_compat.py must
keep restoring THIS blob byte-for-byte-faithfully forever (VERDICT r3 #7).

Every parameter/optimizer leaf is filled with a constant derived from its
flattened position (``(3 * i + 7) % 251 / 100``) — constants gzip ~1000:1
(the committed blob is a few hundred KB instead of 64 MB) while still
detecting any leaf-order / leaf-mapping drift on restore, which all-zeros
could not. step and the RNG key are non-trivial values for the same reason.

Usage:  python tests/fixtures/make_checkpoint_fixture.py
Writes: tests/fixtures/ckpt_v1.msgpack.gz + tests/fixtures/ckpt_v1.config.json
"""

import gzip
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np


def leaf_fill(i: int) -> float:
    return ((3 * i + 7) % 251) / 100.0


def build_state_and_cfg():
    from mcseg_tpu.core.config import (
        DataConfig,
        ExperimentConfig,
        ModelConfig,
        TrainConfig,
    )
    from mcseg_tpu.train.state import create_train_state

    cfg = ExperimentConfig(
        model=ModelConfig(net="drn_d_22", input_ch=3, n_class=5,
                          dtype="float32", upsample="convt"),
        data=DataConfig(src_dataset="synthetic", tgt_dataset="synthetic",
                        batch_size=2, train_img_shape=(16, 16),
                        test_img_shape=(16, 16), input_ch=3),
        train=TrainConfig(opt="sgd", lr=0.05, momentum=0.9),
    )
    state, _, _ = create_train_state(cfg.model, cfg.train, jax.random.key(0),
                                     img_shape=(16, 16))
    # deterministic recognizable leaves: constant per flattened position
    leaves, treedef = jax.tree_util.tree_flatten(
        {"params": state.params, "batch_stats": state.batch_stats,
         "opt_g": state.opt_g, "opt_f": state.opt_f})
    filled = [jnp.full_like(v, leaf_fill(i)) if hasattr(v, "shape") else v
              for i, v in enumerate(leaves)]
    tree = jax.tree_util.tree_unflatten(treedef, filled)
    state = state.replace(
        step=jnp.asarray(1234, jnp.int32),
        params=tree["params"], batch_stats=tree["batch_stats"],
        opt_g=tree["opt_g"], opt_f=tree["opt_f"],
        rng=jax.random.key(99),
    )
    return state, cfg


def main():
    jax.config.update("jax_platforms", "cpu")
    from mcseg_tpu.utils.checkpoint import save_checkpoint

    here = os.path.dirname(os.path.abspath(__file__))
    state, cfg = build_state_and_cfg()
    tmp_prefix = os.path.join(here, "_tmp_ckpt_v1")
    save_checkpoint(tmp_prefix, state, cfg)
    with open(tmp_prefix + ".msgpack", "rb") as f:
        blob = f.read()
    with gzip.open(os.path.join(here, "ckpt_v1.msgpack.gz"), "wb",
                   compresslevel=9) as f:
        f.write(blob)
    os.replace(tmp_prefix + ".config.json",
               os.path.join(here, "ckpt_v1.config.json"))
    os.remove(tmp_prefix + ".msgpack")
    print(f"wrote ckpt_v1.msgpack.gz ({len(blob)} bytes uncompressed, "
          f"{os.path.getsize(os.path.join(here, 'ckpt_v1.msgpack.gz'))} "
          "compressed)")


if __name__ == "__main__":
    sys.exit(main())
