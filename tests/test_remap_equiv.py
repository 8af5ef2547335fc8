"""Select-chain remap == table gather for every corpus table."""

import jax.numpy as jnp
import numpy as np

from mcseg_tpu.data.labels import (
    cityscapes_id_to_train_table,
    nyu40_raw_to_train_table,
    synthia_to_train_table,
)
from mcseg_tpu.ops.preprocess import apply_remap


def test_apply_remap_equals_gather_all_tables():
    rng = np.random.RandomState(0)
    labels = rng.randint(0, 256, (3, 17, 23)).astype(np.uint8)
    for table in (
        cityscapes_id_to_train_table(),
        nyu40_raw_to_train_table(),
        synthia_to_train_table(),
    ):
        want = table[labels.astype(np.int64)].astype(np.int32)
        got = np.asarray(apply_remap(jnp.asarray(labels), table))
        np.testing.assert_array_equal(got, want)
