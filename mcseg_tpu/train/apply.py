"""Functional model application helpers shared by the train steps.

Linen modules may or may not carry a 'batch_stats' collection (DRN trunks do,
heads don't) and may need a dropout rng (the VGG trunk). These helpers hide
that so the train-step code reads like the math.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp


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


def apply_classifier_pair(f1, params1, f2, params2, feat, train: bool):
    """Apply two classifier heads to the SAME feature map -> (o1, o2).

    MEASURED NEGATIVE RESULT — kept tested but NOT used in the train steps.
    The idea: when both heads are plain PixelClassifiers with matching
    geometry, concatenate the two 1x1 kernels/biases along the output-channel
    axis and run ONE score conv + ONE logits upsample at doubled width, then
    split — exact (each output channel's feature contraction, bias add, and
    per-channel bilinear upsample are independent of its neighbors;
    tests/test_models.py::test_classifier_pair_fusion_exact), halving the
    head-op count and doubling the MXU output arity of the sub-128-channel
    score convs. Wired into the MCD/source/multitask steps it benched
    **63.0 -> 53.9 img/s/chip** at 640x480/batch 24 on v5e: splitting the
    doubled-width fp32 logits on the channel-minor axis at FULL resolution
    materializes two extra [B,480,640,n] copies per application (~14/iter),
    which dwarfs the ~15 ms/step of 1x1-head inefficiency it removes. The
    two-apply path lets XLA fuse each head's upsample straight into its
    softmax/CE consumer with no slice-copy. Non-PixelClassifier heads (late
    fusion, FCN8s skip decoder) always take the two-apply path.
    """
    from mcseg_tpu.models.heads import PixelClassifier, upsample_logits

    if (
        isinstance(f1, PixelClassifier)
        and isinstance(f2, PixelClassifier)
        and (f1.n_class, f1.up_factor, f1.upsample, f1.dtype)
        == (f2.n_class, f2.up_factor, f2.upsample, f2.dtype)
    ):
        dt = f1.dtype
        k = jnp.concatenate(
            [params1["score"]["kernel"], params2["score"]["kernel"]], axis=-1
        ).astype(dt)
        b = jnp.concatenate(
            [params1["score"]["bias"], params2["score"]["bias"]]
        ).astype(dt)
        y = jax.lax.conv_general_dilated(
            feat.astype(dt), k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        y = upsample_logits(y, f1.up_factor, f1.upsample)
        y = y.astype(jnp.promote_types(y.dtype, jnp.float32))
        return y[..., : f1.n_class], y[..., f1.n_class:]
    return (
        apply_classifier(f1, params1, feat, train),
        apply_classifier(f2, params2, feat, train),
    )
