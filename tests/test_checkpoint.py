"""Checkpoint round-trip: params/opt/rng/step restore exactly; the model is
rebuilt FROM THE EMBEDDED CONFIG (the reference's args-in-checkpoint public
surface, SURVEY.md section 5)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from mcseg_tpu.core.config import DataConfig, ExperimentConfig, ModelConfig, TrainConfig
from mcseg_tpu.models.factory import get_models
from mcseg_tpu.train.mcd import make_mcd_step
from mcseg_tpu.train.state import create_train_state
from mcseg_tpu.utils.checkpoint import (
    checkpoint_exists,
    load_checkpoint,
    save_checkpoint,
)

HW = (16, 16)


def _exp_cfg():
    return ExperimentConfig(
        model=ModelConfig(net="drn_d_22", input_ch=3, n_class=4, dtype="float32"),
        data=DataConfig(batch_size=2, train_img_shape=HW[::-1]),
        train=TrainConfig(lr=0.01, num_k=2, max_steps=50),
    )


def _trees_equal(a, b, atol=0.0):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol)


def test_roundtrip_exact(tmp_path):
    cfg = _exp_cfg()
    state, tx_g, tx_f = create_train_state(
        cfg.model, cfg.train, jax.random.key(3), img_shape=HW
    )
    # advance one MCD step so optimizer states are non-trivial
    g, f1, f2 = get_models(cfg.model)
    step = jax.jit(make_mcd_step(g, f1, f2, tx_g, tx_f, cfg.train))
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.rand(2, *HW, 3).astype(np.float32))
    ys = jnp.asarray(rng.randint(0, 4, (2, *HW)))
    xt = jnp.asarray(rng.rand(2, *HW, 3).astype(np.float32))
    state, _ = step(state, xs, ys, xt)

    prefix = str(tmp_path / "ep1")
    save_checkpoint(prefix, state, cfg)
    assert checkpoint_exists(prefix)

    restored, cfg2 = load_checkpoint(prefix)
    assert cfg2 == cfg  # the embedded config round-trips to equal dataclasses
    assert int(restored.step) == int(state.step) == 1
    _trees_equal(restored.params, state.params)
    _trees_equal(restored.batch_stats, state.batch_stats)
    _trees_equal(
        jax.tree.leaves(restored.opt_g), jax.tree.leaves(state.opt_g)
    )
    np.testing.assert_array_equal(
        jax.random.key_data(restored.rng), jax.random.key_data(state.rng)
    )


def test_resume_continues_identically(tmp_path):
    """checkpoint -> restore -> step == keep stepping (deterministic resume)."""
    cfg = _exp_cfg()
    state, tx_g, tx_f = create_train_state(
        cfg.model, cfg.train, jax.random.key(0), img_shape=HW
    )
    g, f1, f2 = get_models(cfg.model)
    step = jax.jit(make_mcd_step(g, f1, f2, tx_g, tx_f, cfg.train))
    rng = np.random.RandomState(1)
    xs = jnp.asarray(rng.rand(2, *HW, 3).astype(np.float32))
    ys = jnp.asarray(rng.randint(0, 4, (2, *HW)))
    xt = jnp.asarray(rng.rand(2, *HW, 3).astype(np.float32))

    state, _ = step(state, xs, ys, xt)
    prefix = str(tmp_path / "mid")
    save_checkpoint(prefix, state, cfg)

    cont, _ = step(state, xs, ys, xt)
    restored, _ = load_checkpoint(prefix)
    resumed, _ = step(restored, xs, ys, xt)
    _trees_equal(cont.params, resumed.params, atol=1e-7)


def test_config_roundtrip_dicts():
    cfg = _exp_cfg()
    assert ExperimentConfig.from_dict(cfg.to_dict()) == cfg


def test_resume_config_drift_raises(tmp_path):
    """--resume with a structurally different architecture must fail up front
    with a clear message, not a cryptic tree mismatch deep in restore."""
    import dataclasses

    import pytest

    from mcseg_tpu.train.loops import _init_or_resume

    cfg = _exp_cfg()
    state, _, _ = create_train_state(
        cfg.model, cfg.train, jax.random.key(0), img_shape=HW
    )
    prefix = str(tmp_path / "ep1")
    save_checkpoint(prefix, state, cfg)

    drifted = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, net="drn_d_38", input_ch=6),
        train=dataclasses.replace(cfg.train, resume=prefix),
    )
    with pytest.raises(ValueError, match="--net.*drn_d_22.*drn_d_38"):
        _init_or_resume(drifted)
    with pytest.raises(ValueError, match="--input_ch"):
        _init_or_resume(drifted)

    # same architecture resumes fine (non-structural fields may differ)
    ok = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, resume=prefix, lr=0.5)
    )
    restored, _, _ = _init_or_resume(ok)
    _trees_equal(restored.params, state.params)


def test_prune_epoch_checkpoints(tmp_path):
    """Retention: only the newest N epN checkpoints survive; 'last' and a
    keep<=0 no-op are untouched; numeric (not lexicographic) ordering."""
    from mcseg_tpu.utils.checkpoint import prune_epoch_checkpoints

    for name in ("ep2", "ep9", "ep10", "ep11", "last"):
        (tmp_path / f"{name}.msgpack").write_bytes(b"x")
        (tmp_path / f"{name}.config.json").write_text("{}")
    assert prune_epoch_checkpoints(str(tmp_path), 0) == []
    pruned = prune_epoch_checkpoints(str(tmp_path), 2)
    assert [os.path.basename(p) for p in pruned] == ["ep2", "ep9"]
    left = sorted(p.name for p in tmp_path.glob("*.msgpack"))
    assert left == ["ep10.msgpack", "ep11.msgpack", "last.msgpack"]
    assert not (tmp_path / "ep2.config.json").exists()


def test_keep_checkpoints_in_train_loop(tmp_path):
    """--keep_checkpoints through a real train loop: old epoch checkpoints
    are pruned as training advances."""
    import jax

    from mcseg_tpu.core.config import (
        DataConfig, ExperimentConfig, ModelConfig, TrainConfig)
    from mcseg_tpu.train.loops import train_source

    cfg = ExperimentConfig(
        model=ModelConfig(net="drn_d_22", input_ch=3, n_class=5,
                          dtype="float32"),
        data=DataConfig(src_dataset="synthetic", tgt_dataset="synthetic",
                        batch_size=8, train_img_shape=(32, 32),
                        test_img_shape=(32, 32), input_ch=3, max_samples=16),
        train=TrainConfig(lr=0.01, lr_schedule="constant", epochs=4,
                          log_every=10, out_dir=str(tmp_path / "run"),
                          keep_checkpoints=2, max_steps=100),
    )
    train_source(cfg)
    eps = sorted(p.name for p in (tmp_path / "run").glob("ep*.msgpack"))
    assert eps == ["ep3.msgpack", "ep4.msgpack"]
    assert (tmp_path / "run" / "last.msgpack").exists()


def test_async_checkpointer_roundtrip_and_order(tmp_path):
    """AsyncCheckpointer: the background write publishes the same bytes the
    sync path would; writes to one prefix land in submission order; `after`
    callbacks run AFTER their write is visible on disk (the pruning
    contract)."""
    from mcseg_tpu.utils.checkpoint import AsyncCheckpointer

    cfg = _exp_cfg()
    s1, _, _ = create_train_state(cfg.model, cfg.train, jax.random.key(1),
                                  img_shape=HW)
    s2, _, _ = create_train_state(cfg.model, cfg.train, jax.random.key(2),
                                  img_shape=HW)

    sync_prefix = str(tmp_path / "sync")
    save_checkpoint(sync_prefix, s2, cfg)

    seen = []
    ck = AsyncCheckpointer()
    prefix = str(tmp_path / "ep1")
    ck.save(prefix, s1, cfg,
            after=lambda: seen.append(("first", checkpoint_exists(prefix))))
    ck.save(prefix, s2, cfg,
            after=lambda: seen.append(("second", checkpoint_exists(prefix))))
    ck.close()

    assert seen == [("first", True), ("second", True)]
    # the LAST submitted state is what the prefix holds, byte-equal to sync
    with open(prefix + ".msgpack", "rb") as f_a, \
            open(sync_prefix + ".msgpack", "rb") as f_b:
        assert f_a.read() == f_b.read()
    restored, cfg2 = load_checkpoint(prefix)
    assert cfg2 == cfg
    _trees_equal(restored.params, s2.params)


def test_async_checkpointer_error_surfaces(tmp_path):
    """A writer-thread failure must raise on join(), never pass silently."""
    import pytest

    from mcseg_tpu.utils.checkpoint import AsyncCheckpointer

    cfg = _exp_cfg()
    state, _, _ = create_train_state(cfg.model, cfg.train, jax.random.key(0),
                                     img_shape=HW)
    blocker = tmp_path / "not_a_dir"
    blocker.write_text("file where the checkpoint dir should go")
    ck = AsyncCheckpointer()
    ck.save(str(blocker / "ep1"), state, cfg)  # mkdir under a file -> fails
    with pytest.raises(RuntimeError, match="async checkpoint write failed"):
        ck.join()


def test_train_loop_async_default_and_sync_flag(tmp_path):
    """The loops run async by default (train_source completes with all epoch
    checkpoints + `last` on disk and loadable) and --sync_checkpoint plumbs
    through to TrainConfig."""
    from mcseg_tpu.cli.argparse_compat import (
        args_to_config,
        get_da_mcd_training_parser,
    )

    p = get_da_mcd_training_parser()
    assert args_to_config(
        p.parse_args(["synthetic", "synthetic"]), adapt=True
    ).train.async_checkpoint is True
    assert args_to_config(
        p.parse_args(["synthetic", "synthetic", "--sync_checkpoint"]),
        adapt=True,
    ).train.async_checkpoint is False

    from mcseg_tpu.train.loops import train_source

    cfg = ExperimentConfig(
        model=ModelConfig(net="drn_d_22", input_ch=3, n_class=4,
                          dtype="float32"),
        data=DataConfig(src_dataset="synthetic", tgt_dataset="synthetic",
                        batch_size=8, train_img_shape=HW[::-1],
                        test_img_shape=HW[::-1], max_samples=16),
        train=TrainConfig(lr=0.01, epochs=2, max_steps=50,
                          out_dir=str(tmp_path / "run"), log_every=100),
    )
    assert cfg.train.async_checkpoint  # the default
    train_source(cfg, max_iterations=4)  # 16/8 = 2 steps/epoch -> 2 epochs
    for name in ("ep1", "ep2", "last"):
        prefix = os.path.join(cfg.train.out_dir, name)
        assert checkpoint_exists(prefix), name
        restored, _ = load_checkpoint(prefix)
        assert restored.params is not None
