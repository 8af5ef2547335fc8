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
    state, step, img, label = _setup()

    # single device (default placement)
    s1, m1 = step(state, img, label)

    # 8-device mesh: replicated state, sharded batch
    mesh = make_mesh()
    state8 = replicate(mesh, state)
    img8 = jax.device_put(img, batch_sharding(mesh))
    label8 = jax.device_put(label, batch_sharding(mesh))
    s8, m8 = step(state8, img8, label8)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m8["loss"]), rtol=2e-5, atol=1e-6
    )
    # psum over 8 shards reduces in a different order than one big reduction;
    # allow reduction-order float noise (absolute, not relative — BN biases
    # sit near zero after one update)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-4)


def test_sharded_step_keeps_params_replicated():
    state, step, img, label = _setup()
    mesh = make_mesh()
    state8 = replicate(mesh, state)
    img8 = jax.device_put(img, batch_sharding(mesh))
    label8 = jax.device_put(label, batch_sharding(mesh))
    s8, _ = step(state8, img8, label8)
    leaf = jax.tree.leaves(s8.params)[0]
    assert leaf.sharding.is_fully_replicated
