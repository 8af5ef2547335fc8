"""Functional model application helpers shared by the train steps.

Linen modules may or may not carry a 'batch_stats' collection (DRN trunks do,
heads don't) and may need a dropout rng (the VGG trunk). These helpers hide
that so the train-step code reads like the math.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax


def apply_generator(
    g, params, batch_stats, x, train: bool, rng: jax.Array | None = None
) -> Tuple[Any, Any]:
    """Forward the feature generator. Returns (features, new_batch_stats).

    In train mode BN uses batch statistics and the running stats advance —
    matching the reference, where G runs in .train() mode in every MCD
    sub-step (SURVEY.md section 7 'hard parts' (a))."""
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    rngs = {"dropout": rng} if (train and rng is not None) else None
    if train and batch_stats:
        feat, mut = g.apply(variables, x, True, mutable=["batch_stats"], rngs=rngs)
        return feat, mut["batch_stats"]
    feat = g.apply(variables, x, train, rngs=rngs)
    return feat, batch_stats


def apply_classifier(f, params, feat, train: bool):
    return f.apply({"params": params}, feat, train)
