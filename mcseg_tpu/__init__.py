"""mcseg_tpu — TPU-native multichannel semantic segmentation with unsupervised
domain adaptation.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
``LittleWat/multichannel-semseg-with-uda`` (PyTorch): a dilated-ResNet (DRN)
feature generator feeding one or two FCN pixel-classifier heads, trained either
source-only or with Maximum-Classifier-Discrepancy (MCD) unsupervised domain
adaptation from a labeled synthetic domain (SUNCG, GTA5) to an unlabeled real
domain (NYUDv2, Cityscapes), with early / late-score fusion of RGB and
depth/HHA channels.

Design is TPU-first, not a port:
  * NHWC layouts, bf16 matmul with fp32 params, static shapes everywhere.
  * The MCD 3-step min-max (SURVEY.md section 3.2) is ONE jit-compiled train
    step using functional gradients over parameter subtrees instead of the
    reference's "zero both optimizers, step one" freeze idiom.
  * Data parallelism is ``jax.sharding`` over a Mesh with XLA collectives over
    ICI, not ``torch.nn.DataParallel``.
  * Preprocessing (depth->HHA, joint resize/crop/flip, normalize, channel
    stack) runs fused on-device (ops/), fed by a double-buffered host pipeline.
"""

__version__ = "0.5.0"  # kept in sync with pyproject.toml

from mcseg_tpu.core.config import (  # noqa: F401
    DataConfig,
    ModelConfig,
    TrainConfig,
)
