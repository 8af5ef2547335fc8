"""Checkpoint forward-compatibility guard (VERDICT r3 #7).

tests/fixtures/ckpt_v1.msgpack.gz is a COMMITTED checkpoint blob written by
the round-3/4-era ``save_checkpoint`` (see fixtures/make_checkpoint_fixture.py
for exactly how it was made). Today's ``load_checkpoint`` must keep restoring
it — structure, values, step, and RNG key — forever: if the serialized layout,
leaf ordering, state fields, or config schema ever evolve, THIS test is the
tripwire that forces an explicit migration path instead of silently orphaning
every checkpoint written by earlier versions (SURVEY.md section 5 checkpoint/
resume contract: "rerun with --resume <prefix>").

Leaf values in the fixture are position-derived constants
(``(3*i + 7) % 251 / 100`` over the flattened {params, batch_stats, opt_g,
opt_f} tree), so a restore that permutes or remaps leaves — not just one that
crashes — fails loudly.
"""

import gzip
import os
import shutil

import jax
import numpy as np

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


def leaf_fill(i: int) -> float:
    return ((3 * i + 7) % 251) / 100.0


def _unpack_fixture(tmp_path) -> str:
    prefix = str(tmp_path / "ckpt_v1")
    with gzip.open(os.path.join(FIXDIR, "ckpt_v1.msgpack.gz"), "rb") as f:
        blob = f.read()
    with open(prefix + ".msgpack", "wb") as f:
        f.write(blob)
    shutil.copy(os.path.join(FIXDIR, "ckpt_v1.config.json"),
                prefix + ".config.json")
    return prefix


def test_v1_checkpoint_restores(tmp_path):
    from mcseg_tpu.utils.checkpoint import load_checkpoint

    prefix = _unpack_fixture(tmp_path)
    state, cfg = load_checkpoint(prefix)

    # config sidecar round-trips into the typed config (the 'args' surface)
    assert cfg.model.net == "drn_d_22"
    assert cfg.model.n_class == 5 and cfg.model.input_ch == 3
    assert cfg.train.opt == "sgd" and abs(cfg.train.lr - 0.05) < 1e-12

    assert int(state.step) == 1234
    # RNG key restored exactly (resume determinism depends on it)
    np.testing.assert_array_equal(
        jax.random.key_data(state.rng), jax.random.key_data(jax.random.key(99)))

    # every leaf carries its position-derived constant: catches leaf
    # permutation/remapping, not just restore crashes
    leaves = jax.tree_util.tree_flatten(
        {"params": state.params, "batch_stats": state.batch_stats,
         "opt_g": state.opt_g, "opt_f": state.opt_f})[0]
    arrays = [v for v in leaves if hasattr(v, "shape")]
    assert len(arrays) > 100  # a real DRN tree, not a stub
    for i, v in enumerate(arrays):
        a = np.asarray(v)
        want = leaf_fill(i)
        assert np.all(a == np.asarray(want, a.dtype)), (
            f"leaf {i}: expected constant {want}, got "
            f"min={a.min()} max={a.max()} — leaf mapping drifted; write a "
            "format migration, do not regenerate the fixture")


def test_v1_checkpoint_is_resumable(tmp_path):
    """The restored state is structurally identical to a fresh skeleton:
    optimizer states and batch_stats slot straight into today's train step
    (tree structure equality is what jit'd resume actually requires)."""
    from mcseg_tpu.core.config import ExperimentConfig
    from mcseg_tpu.train.state import create_train_state
    from mcseg_tpu.utils.checkpoint import load_checkpoint
    from mcseg_tpu.utils.util import load_json

    prefix = _unpack_fixture(tmp_path)
    state, cfg = load_checkpoint(prefix)
    skeleton, _, _ = create_train_state(cfg.model, cfg.train,
                                        jax.random.key(0), img_shape=(16, 16))
    t_loaded = jax.tree_util.tree_structure(
        {"params": state.params, "batch_stats": state.batch_stats,
         "opt_g": state.opt_g, "opt_f": state.opt_f})
    t_fresh = jax.tree_util.tree_structure(
        {"params": skeleton.params, "batch_stats": skeleton.batch_stats,
         "opt_g": skeleton.opt_g, "opt_f": skeleton.opt_f})
    assert t_loaded == t_fresh
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(skeleton.params)):
        assert a.shape == b.shape and a.dtype == b.dtype
