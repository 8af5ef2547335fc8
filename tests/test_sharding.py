"""Data-parallel mesh semantics on the virtual 8-device CPU mesh
(SURVEY.md section 4 'distributed-without-a-cluster'):

  * batches shard on 'data', params replicate;
  * the sharded train step produces the SAME result as single-device on the
    same global batch (the psum'd gradient is identical math).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcseg_tpu.core.config import ModelConfig, TrainConfig
from mcseg_tpu.models.factory import get_models
from mcseg_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)
from mcseg_tpu.train.source import make_source_step
from mcseg_tpu.train.state import create_train_state

HW = (16, 16)
NCLASS = 4


def test_mesh_has_8_virtual_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


def test_make_mesh_subset_and_overflow():
    assert make_mesh(4).devices.size == 4
    with pytest.raises(ValueError):
        make_mesh(1000)


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh()
    batch = {"x": np.zeros((8, 4, 4), np.float32)}
    out = shard_batch(mesh, batch)
    assert out["x"].sharding == batch_sharding(mesh)
    # each device holds 1/8 of the batch
    assert out["x"].addressable_shards[0].data.shape == (1, 4, 4)


def test_replicate_places_everywhere():
    mesh = make_mesh()
    tree = {"w": np.ones((3, 3), np.float32)}
    out = replicate(mesh, tree)
    assert out["w"].sharding == replicated_sharding(mesh)
    assert out["w"].sharding.is_fully_replicated


def _setup():
    mcfg = ModelConfig(net="drn_d_22", input_ch=3, n_class=NCLASS, dtype="float32")
    tcfg = TrainConfig(lr=0.01, lr_schedule="constant", max_steps=100)
    state, tx_g, tx_f = create_train_state(mcfg, tcfg, jax.random.key(0), img_shape=HW)
    g, f1, f2 = get_models(mcfg)
    step = jax.jit(make_source_step(g, f1, f2, tx_g, tx_f, tcfg))
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(8, *HW, 3).astype(np.float32))
    label = jnp.asarray(rng.randint(0, NCLASS, size=(8, *HW)))
    return state, step, img, label


def test_sharded_step_matches_single_device():
    """Sharded-vs-single equivalence, judged against a float64 oracle.

    The 1-device and 8-device fp32 runs reduce gradients in different orders,
    so they differ by fp32 rounding noise — comparing them to each other with
    a hand-tuned atol is unprincipled (and was flaky). Instead, run the SAME
    step with float64 compute (same fp32 parameter values) as ground truth and
    assert the sharded run is no farther from the truth than a small multiple
    of the single-device run's own fp32 rounding error. A real sharding bug
    (wrong psum, missing shard, double-counted gradient) produces an error
    orders of magnitude above this bound.
    """
    import contextlib
    import dataclasses

    @contextlib.contextmanager
    def enable_x64():
        jax.config.update("jax_enable_x64", True)
        try:
            yield
        finally:
            jax.config.update("jax_enable_x64", False)

    state, step, img, label = _setup()

    # single device (default placement)
    s1, m1 = step(state, img, label)

    # 8-device mesh: replicated state, sharded batch
    mesh = make_mesh()
    state8 = replicate(mesh, state)
    img8 = jax.device_put(img, batch_sharding(mesh))
    label8 = jax.device_put(label, batch_sharding(mesh))
    s8, m8 = step(state8, img8, label8)

    # float64 oracle: identical parameter values, float64 compute everywhere.
    with enable_x64():
        mcfg64 = dataclasses.replace(
            ModelConfig(net="drn_d_22", input_ch=3, n_class=NCLASS, dtype="float64")
        )
        tcfg = TrainConfig(lr=0.01, lr_schedule="constant", max_steps=100)
        _, tx_g, tx_f = create_train_state(
            ModelConfig(net="drn_d_22", input_ch=3, n_class=NCLASS, dtype="float32"),
            tcfg, jax.random.key(0), img_shape=HW,
        )
        g64, f164, f264 = get_models(mcfg64)
        step64 = jax.jit(make_source_step(g64, f164, f264, tx_g, tx_f, tcfg))

        def _to64(t):
            return jax.tree.map(
                lambda x: x.astype(jnp.float64) if x.dtype == jnp.float32 else x, t
            )

        s64, m64 = step64(_to64(state), img.astype(jnp.float64), label)

    loss64 = float(m64["loss"])
    err1_loss = abs(float(m1["loss"]) - loss64)
    err8_loss = abs(float(m8["loss"]) - loss64)
    assert err8_loss <= 4 * err1_loss + 1e-6 * (1 + abs(loss64))

    leaves64 = jax.tree.leaves(s64.params)
    leaves1 = jax.tree.leaves(s1.params)
    leaves8 = jax.tree.leaves(s8.params)
    assert len(leaves64) == len(leaves1) == len(leaves8)
    err1 = np.array([
        np.max(np.abs(np.asarray(a, np.float64) - np.asarray(o, np.float64)))
        for o, a in zip(leaves64, leaves1)
    ])
    err8 = np.array([
        np.max(np.abs(np.asarray(b, np.float64) - np.asarray(o, np.float64)))
        for o, b in zip(leaves64, leaves8)
    ])
    # Model-wide: the sharded run must be no farther from the fp64 truth than
    # a few x the single-device run's own fp32 rounding error.
    assert err8.max() <= 4 * err1.max() + 1e-6, (err1.max(), err8.max())
    # Per-leaf: where the 1-device error is incidentally ~0, the leaf may
    # still carry noise up to the model-wide fp32 rounding scale (reduction
    # trees differ leaf by leaf), plus an eps*|param| floor. A real sharding
    # bug (wrong/missing psum, double-counted shard) shows up at the update
    # scale ~lr*grad, orders of magnitude above this.
    for i, (o, e1, e8) in enumerate(zip(leaves64, err1, err8)):
        floor = 1.2e-7 * (1.0 + np.max(np.abs(np.asarray(o, np.float64))))
        assert e8 <= max(4 * e1, err1.max()) + 8 * floor, (i, e1, e8, err1.max())


def _enable_x64():
    import contextlib

    @contextlib.contextmanager
    def ctx():
        jax.config.update("jax_enable_x64", True)
        try:
            yield
        finally:
            jax.config.update("jax_enable_x64", False)

    return ctx()


def _to64(t):
    return jax.tree.map(
        lambda x: x.astype(jnp.float64) if x.dtype == jnp.float32 else x, t
    )


def _assert_fp64_oracle_parity(build_step, state, inputs):
    """Sharded-vs-single equivalence judged against a float64 oracle — the
    methodology of test_sharded_step_matches_single_device, reusable for any
    step. ``build_step(dtype)`` returns a jitted (state, *inputs) ->
    (state, metrics) step with that compute dtype; same parameter values in
    all three runs."""
    step = build_step("float32")
    s1, m1 = step(state, *inputs)

    mesh = make_mesh()
    state8 = replicate(mesh, state)
    inputs8 = [jax.device_put(x, batch_sharding(mesh)) for x in inputs]
    s8, m8 = step(state8, *inputs8)

    with _enable_x64():
        step64 = build_step("float64")
        inputs64 = [
            x.astype(jnp.float64) if x.dtype == jnp.float32 else x
            for x in inputs
        ]
        s64, m64 = step64(_to64(state), *inputs64)

        for k in m64:
            v64 = np.asarray(m64[k], np.float64)
            if v64.dtype.kind != "f":
                continue
            e1 = abs(float(m1[k]) - float(v64))
            e8 = abs(float(m8[k]) - float(v64))
            assert e8 <= 4 * e1 + 1e-6 * (1 + abs(float(v64))), (k, e1, e8)

        leaves64 = jax.tree.leaves(s64.params)
        leaves1 = jax.tree.leaves(s1.params)
        leaves8 = jax.tree.leaves(s8.params)
        assert len(leaves64) == len(leaves1) == len(leaves8)
        err1 = np.array([
            np.max(np.abs(np.asarray(a, np.float64) - np.asarray(o, np.float64)))
            for o, a in zip(leaves64, leaves1)
        ])
        err8 = np.array([
            np.max(np.abs(np.asarray(b, np.float64) - np.asarray(o, np.float64)))
            for o, b in zip(leaves64, leaves8)
        ])
        assert err8.max() <= 4 * err1.max() + 1e-6, (err1.max(), err8.max())
        for i, (o, e1, e8) in enumerate(zip(leaves64, err1, err8)):
            floor = 1.2e-7 * (1.0 + np.max(np.abs(np.asarray(o, np.float64))))
            assert e8 <= max(4 * e1, err1.max()) + 8 * floor, (
                i, e1, e8, err1.max())


@pytest.mark.slow
def test_sharded_mcd_step_matches_single_device():
    """The fp64-oracle sharded parity for the FLAGSHIP path: the fused MCD
    A/B/C step on the 8-device mesh (VERDICT r1 #4 — previously only the
    source step had this; MCD was smoke-checked)."""
    from mcseg_tpu.train.mcd import make_mcd_step

    tcfg = TrainConfig(lr=0.01, num_k=2, lr_schedule="constant", max_steps=100)
    state, _, _ = create_train_state(
        ModelConfig(net="drn_d_22", input_ch=3, n_class=NCLASS, dtype="float32"),
        tcfg, jax.random.key(0), img_shape=HW,
    )

    def build_step(dtype):
        mcfg = ModelConfig(net="drn_d_22", input_ch=3, n_class=NCLASS, dtype=dtype)
        _, tx_g, tx_f = create_train_state(
            ModelConfig(net="drn_d_22", input_ch=3, n_class=NCLASS,
                        dtype="float32"),
            tcfg, jax.random.key(0), img_shape=HW,
        )
        g, f1, f2 = get_models(mcfg)
        return jax.jit(make_mcd_step(g, f1, f2, tx_g, tx_f, tcfg))

    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.rand(8, *HW, 3).astype(np.float32))
    ys = jnp.asarray(rng.randint(0, NCLASS, size=(8, *HW)))
    xt = jnp.asarray(rng.rand(8, *HW, 3).astype(np.float32))
    _assert_fp64_oracle_parity(build_step, state, [xs, ys, xt])


@pytest.mark.slow
def test_sharded_multitask_mcd_step_matches_single_device():
    """Same oracle methodology for the multitask MCD step (seg + berHu depth
    in step A)."""
    from mcseg_tpu.train.multitask import (
        init_multitask_state,
        make_multitask_mcd_step,
    )

    tcfg = TrainConfig(lr=0.01, num_k=1, lr_schedule="constant", max_steps=100)
    mcfg32 = ModelConfig(net="drn_d_22", input_ch=3, n_class=NCLASS,
                         dtype="float32")
    state, _, _, _ = init_multitask_state(mcfg32, tcfg, jax.random.key(0),
                                          img_shape=HW)

    def build_step(dtype):
        from mcseg_tpu.models.heads import DepthRegressor

        mcfg = ModelConfig(net="drn_d_22", input_ch=3, n_class=NCLASS, dtype=dtype)
        _, tx_g, tx_f, _ = init_multitask_state(
            mcfg32, tcfg, jax.random.key(0), img_shape=HW)
        g, f1, f2 = get_models(mcfg)
        # the oracle must run the depth head in fp64 too
        d_head = DepthRegressor(
            upsample=mcfg.upsample,
            dtype=jnp.float64 if dtype == "float64" else jnp.float32)
        return jax.jit(make_multitask_mcd_step(
            g, f1, f2, d_head, tx_g, tx_f, tcfg, depth_weight=0.5))

    rng = np.random.RandomState(1)
    xs = jnp.asarray(rng.rand(8, *HW, 3).astype(np.float32))
    ys = jnp.asarray(rng.randint(0, NCLASS, size=(8, *HW)))
    ds = jnp.asarray((rng.rand(8, *HW) * 3 + 0.5).astype(np.float32))
    xt = jnp.asarray(rng.rand(8, *HW, 3).astype(np.float32))
    _assert_fp64_oracle_parity(build_step, state, [xs, ys, ds, xt])


def test_sharded_step_keeps_params_replicated():
    state, step, img, label = _setup()
    mesh = make_mesh()
    state8 = replicate(mesh, state)
    img8 = jax.device_put(img, batch_sharding(mesh))
    label8 = jax.device_put(label, batch_sharding(mesh))
    s8, _ = step(state8, img8, label8)
    leaf = jax.tree.leaves(s8.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_sharded_eval_hist_identical_to_single_device():
    """Epoch-end evaluation over the mesh: the psum'd fast-hist is
    bit-identical to the single-device confusion matrix (integer scatter-adds
    commute), and mIoU matches exactly."""
    from mcseg_tpu.core.config import DataConfig, ExperimentConfig
    from mcseg_tpu.data.datasets import SyntheticDataset
    from mcseg_tpu.eval.tester import evaluate

    dcfg = DataConfig(src_dataset="synthetic", tgt_dataset="synthetic",
                      batch_size=8, train_img_shape=(32, 32),
                      test_img_shape=(32, 32), n_class=NCLASS, max_samples=10)
    cfg = ExperimentConfig(
        model=ModelConfig(net="drn_d_22", input_ch=3, n_class=NCLASS,
                          dtype="float32"),
        data=dcfg, train=TrainConfig())
    state, _, _ = create_train_state(cfg.model, cfg.train, jax.random.key(0),
                                     img_shape=(32, 32))
    ds = SyntheticDataset(dcfg, "val")

    miou1, hist1, _ = evaluate(state, cfg, ds, print_table=False)
    mesh = make_mesh()
    miou8, hist8, _ = evaluate(state, cfg, ds, print_table=False, mesh=mesh)
    np.testing.assert_array_equal(hist1, hist8)
    assert miou1 == miou8


def test_make_mesh_spatial_and_constraint_noop():
    """2-D (data x space) mesh construction + the constraint's 1-D no-op."""
    from mcseg_tpu.parallel.mesh import constrain_spatial, spatial_size

    mesh = make_mesh(spatial=4)
    assert mesh.axis_names == ("data", "space")
    assert dict(mesh.shape) == {"data": 2, "space": 4}
    assert spatial_size(mesh) == 4
    assert spatial_size(make_mesh()) == 1
    with pytest.raises(ValueError):
        make_mesh(spatial=3)  # does not divide 8
    x = jnp.zeros((4, 8, 8, 3))
    assert constrain_spatial(make_mesh(), x) is x  # no-op on 1-D meshes


def test_spatial_sharded_source_step_smoke():
    """Height-sharded source step on a (2,4) mesh runs, keeps params
    replicated, and stays close to the single-device fp32 run."""
    from mcseg_tpu.parallel.mesh import constrain_spatial

    state, step, img, label = _setup()
    s1, m1 = step(state, img, label)

    mesh = make_mesh(spatial=4)

    @jax.jit
    def sp_step(state, img, label):
        return step(state, constrain_spatial(mesh, img),
                    constrain_spatial(mesh, label))

    s8, m8 = sp_step(replicate(mesh, state),
                     jax.device_put(img, batch_sharding(mesh)),
                     jax.device_put(label, batch_sharding(mesh)))
    assert np.isfinite(float(m8["loss"]))
    assert jax.tree.leaves(s8.params)[0].sharding.is_fully_replicated
    assert abs(float(m8["loss"]) - float(m1["loss"])) <= 1e-4 * (
        1 + abs(float(m1["loss"])))


@pytest.mark.slow
def test_spatial_sharded_mcd_step_fp64_equality():
    """The GSPMD spatial-partitioning path (--spatial_devices) against the
    fp64 oracle: one fused MCD iteration with every activation height-sharded
    over 4 devices (s2d packed execution ON — the packing reshapes must
    survive sharded H) equals the single-device run of the same fp64 global
    batch to 1e-9 in metrics and every parameter."""
    from mcseg_tpu.parallel.mesh import constrain_spatial
    from mcseg_tpu.train.mcd import make_mcd_step

    shape = (32, 16)  # H=32 over 4 shards; deepest level keeps 1 row/shard
    with _enable_x64():
        mcfg = ModelConfig(net="drn_d_22", input_ch=3, n_class=NCLASS,
                           dtype="float64", s2d="on")
        tcfg = TrainConfig(lr=0.01, num_k=2, lr_schedule="constant",
                           max_steps=100)
        state, tx_g, tx_f = create_train_state(
            mcfg, tcfg, jax.random.key(0), img_shape=shape)
        g, f1, f2 = get_models(mcfg)
        inner = make_mcd_step(g, f1, f2, tx_g, tx_f, tcfg)

        rng = np.random.RandomState(0)
        xs = jnp.asarray(rng.rand(4, *shape, 3))
        ys = jnp.asarray(rng.randint(0, NCLASS, size=(4, *shape)))
        xt = jnp.asarray(rng.rand(4, *shape, 3))

        s1, m1 = jax.jit(inner)(state, xs, ys, xt)

        mesh = make_mesh(spatial=4)

        @jax.jit
        def sp_step(state, xs, ys, xt):
            return inner(state, constrain_spatial(mesh, xs),
                         constrain_spatial(mesh, ys),
                         constrain_spatial(mesh, xt))

        put = lambda x: jax.device_put(x, batch_sharding(mesh))
        s8, m8 = sp_step(replicate(mesh, state), put(xs), put(ys), put(xt))

        for k in m1:
            if np.asarray(m1[k]).dtype.kind != "f":
                continue
            a, r = float(m8[k]), float(m1[k])
            assert abs(a - r) <= 1e-9 * (1 + abs(r)), (k, a, r)
        for a, r in zip(jax.tree.leaves(s8.params),
                        jax.tree.leaves(s1.params)):
            err = float(np.max(np.abs(np.asarray(a) - np.asarray(r))))
            assert err <= 1e-9 * (1 + float(np.max(np.abs(np.asarray(r)))))


def test_spatial_devices_cli_plumbing():
    """--spatial_devices flows into TrainConfig and make_mesh."""
    from mcseg_tpu.cli.argparse_compat import (
        args_to_config,
        get_da_mcd_training_parser,
    )

    p = get_da_mcd_training_parser()
    cfg = args_to_config(
        p.parse_args(["synthetic", "synthetic", "--spatial_devices", "4"]),
        adapt=True)
    assert cfg.train.spatial_devices == 4
    assert args_to_config(
        p.parse_args(["synthetic", "synthetic"]), adapt=True
    ).train.spatial_devices == 1
    mesh = make_mesh(spatial=cfg.train.spatial_devices)
    assert dict(mesh.shape) == {"data": 2, "space": 4}
