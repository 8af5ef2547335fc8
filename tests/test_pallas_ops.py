"""Pallas kernels vs their XLA oracles (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mcseg_tpu.ops.pallas.normalize import (
    fused_normalize_stack,
    reference_normalize_stack,
)


@pytest.mark.parametrize("input_ch", [3, 6, 4, 1])
def test_fused_normalize_stack_matches_oracle(input_ch):
    rng = np.random.RandomState(0)
    b, h, w = 2, 16, 32
    rgb = jnp.asarray(rng.randint(0, 255, (b, h, w, 3), np.uint8))
    e_ch = {3: 0, 6: 3, 4: 1, 1: 1}[input_ch]
    extra = (
        jnp.asarray(rng.rand(b, h, w, e_ch).astype(np.float32)) if e_ch else None
    )
    flip = jnp.asarray([0, 1], jnp.int32)

    got = fused_normalize_stack(rgb, extra, flip, input_ch=input_ch, interpret=True)
    want = reference_normalize_stack(rgb, extra if e_ch else None, flip, input_ch)
    assert got.shape == (b, h, w, input_ch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_fused_normalize_flip_only_flips_flagged_samples():
    rng = np.random.RandomState(1)
    rgb = jnp.asarray(rng.randint(0, 255, (2, 8, 16, 3), np.uint8))
    flip = jnp.asarray([0, 1], jnp.int32)
    out = np.asarray(
        fused_normalize_stack(rgb, None, flip, input_ch=3, interpret=True)
    )
    noflip = np.asarray(
        fused_normalize_stack(rgb, None, jnp.zeros(2, jnp.int32), input_ch=3,
                              interpret=True)
    )
    np.testing.assert_array_equal(out[0], noflip[0])
    np.testing.assert_array_equal(out[1], noflip[1][:, ::-1, :])


def test_fused_normalize_bf16_output():
    rng = np.random.RandomState(2)
    rgb = jnp.asarray(rng.randint(0, 255, (1, 8, 16, 3), np.uint8))
    out = fused_normalize_stack(rgb, None, jnp.zeros(1, jnp.int32),
                                input_ch=3, out_dtype=jnp.bfloat16, interpret=True)
    assert out.dtype == jnp.bfloat16
