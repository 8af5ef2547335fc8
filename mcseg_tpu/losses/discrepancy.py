"""Classifier-discrepancy distances for MCD.

Counterpart of the reference's ``get_prob_distance_criterion`` (SURVEY.md
section 2 [?], from MCD_DA): the default 'diff' distance is the mean absolute
difference of the two classifiers' softmax outputs over all pixels and
classes (MCD paper eq. 2, arXiv:1712.02560); 'symkl' is the symmetric-KL
alternative.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from mcseg_tpu.losses.seg import at_least_f32


def discrepancy_diff(logits1: jnp.ndarray, logits2: jnp.ndarray) -> jnp.ndarray:
    """mean |softmax(o1) - softmax(o2)| — MCD's L1 discrepancy."""
    p1 = jax.nn.softmax(at_least_f32(logits1), axis=-1)
    p2 = jax.nn.softmax(at_least_f32(logits2), axis=-1)
    return jnp.mean(jnp.abs(p1 - p2))


def discrepancy_symkl(logits1: jnp.ndarray, logits2: jnp.ndarray) -> jnp.ndarray:
    """Symmetric KL: (KL(p1||p2) + KL(p2||p1)) / 2, mean over pixels."""
    lp1 = jax.nn.log_softmax(at_least_f32(logits1), axis=-1)
    lp2 = jax.nn.log_softmax(at_least_f32(logits2), axis=-1)
    p1 = jnp.exp(lp1)
    p2 = jnp.exp(lp2)
    kl12 = jnp.sum(p1 * (lp1 - lp2), axis=-1)
    kl21 = jnp.sum(p2 * (lp2 - lp1), axis=-1)
    return jnp.mean(0.5 * (kl12 + kl21))


def get_prob_distance_criterion(name: str) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    if name == "diff":
        return discrepancy_diff
    if name in ("symkl", "sym_kl"):
        return discrepancy_symkl
    raise ValueError(f"unknown discrepancy criterion {name!r} (options: diff, symkl)")
