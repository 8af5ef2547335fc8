"""Frozen config dataclasses.

The reference (SURVEY.md L7, `argmyparse.py`) drives every entry point with
argparse flags and persists the parsed args both as JSON and inside each
checkpoint; testers rebuild the model *from the args stored in the checkpoint*.
We keep that contract: these dataclasses carry the same logical fields under
the same names (`net`, `input_ch`, `n_class`, `num_k`, `lr`, `opt`,
`train_img_shape`, ...), serialize to/from plain dicts, and ride inside every
checkpoint (utils/checkpoint.py) so evaluation can reconstruct the exact model.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple


def _asdict(cfg) -> Dict[str, Any]:
    d = dataclasses.asdict(cfg)
    d["__class__"] = type(cfg).__name__
    return d


@dataclass(frozen=True)
class ModelConfig:
    """Model zoo selection — mirrors the reference's `get_models(...)` surface
    (SURVEY.md section 2, `models/model_util.py`)."""

    net: str = "drn_d_38"  # drn_d_22|38|54|105, drn_c_26|42, fcn8s_vgg16
    input_ch: int = 3  # 1 depth | 3 rgb or hha | 4 rgb+d | 6 rgb+hha (early
    # fusion) | 7 rgb+hha+boundary (precomputed edge-map input channel)
    n_class: int = 40  # NYUDv2-40 default; 19 for Cityscapes train IDs
    method: str = "MCD"  # MCD (G,F1,F2) | source-only (G,F1)
    # 'early'  — channel-concat into a widened first conv (input_ch=4/6)
    # 'late'   — two parallel (G,F) branches (rgb, hha) fused by score addition
    # 'single' — one modality
    fusion: str = "single"
    uses_one_classifier: bool = False  # reference ablation flag [SURVEY 2]
    # TPU numerics: bf16 activations/matmuls, fp32 params & batch stats.
    dtype: str = "bfloat16"
    # Pixel-classifier upsampling weights (both run as MXU matmuls, see
    # ops/upsample.py): 'convt' = the reference's fixed-bilinear
    # ConvTranspose2d (fill_up_weights) — bit-exact parity, default |
    # 'resize' = jax.image.resize half-pixel bilinear.
    upsample: str = "convt"
    # Space-to-depth execution of the small-channel early levels (ops/s2d.py):
    # an exact rearrangement (same network function, same parameter tree) that
    # avoids XLA:TPU's padded batch-minor layouts for C<32 convs.
    # 'auto' = on for DRN trunks on TPU, off elsewhere (incl. VGG-FCN8s,
    # where packed stage-1 is exact but measured a wash) | 'on' | 'off'.
    s2d: str = "auto"

    def to_dict(self):
        return _asdict(self)

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "ModelConfig":
        d = {k: v for k, v in d.items() if k != "__class__"}
        if "train_img_shape" in d:
            d["train_img_shape"] = tuple(d["train_img_shape"])
        return ModelConfig(**d)


@dataclass(frozen=True)
class DataConfig:
    """Dataset + preprocessing selection — mirrors the reference L1/L2 flags."""

    src_dataset: str = "suncg"  # suncg | gta5 | nyu | city | synthetic
    tgt_dataset: str = "nyu"
    split: str = "train"
    data_root: str = "./data"
    batch_size: int = 8  # global batch (sharded over the data mesh axis)
    train_img_shape: Tuple[int, int] = (640, 480)  # (W, H) — reference flag order
    test_img_shape: Tuple[int, int] = (640, 480)
    input_ch: int = 3
    n_class: int = 40
    num_workers: int = 4
    # Device-side preprocessing (ops/): random crop fraction + horizontal flip.
    random_flip: bool = True
    random_crop: bool = True
    crop_scale_min: float = 0.7  # min area fraction for RandomSizedCrop-style aug
    # HHA: encode on-device from raw depth (scope extension stated in
    # BASELINE.json north_star) vs. load precomputed HHA PNGs like the reference.
    hha_on_device: bool = True
    max_samples: Optional[int] = None  # mini-split truncation for smoke tests
    # Decoded-sample RAM cache budget (GB, 0 disables): training iterates the
    # same corpus every epoch, so epochs >= 2 read raw uint8 arrays from RAM
    # instead of re-running PNG decode — on small hosts decode is the input
    # ceiling (docs/ARCHITECTURE.md "Numbers"). NYU-scale corpora (~2 GB
    # decoded) fit entirely; oversized corpora cache a prefix and decode the
    # rest each epoch.
    decode_cache_gb: float = 4.0
    # Decoded-corpus DISK cache budget (GB, 0 disables): corpora that exceed
    # the RAM budget decode each sample ONCE into raw memmap plane files next
    # to the corpus (data/disk_cache.py); epochs >= 2 and re-runs assemble
    # batches by mmap read at I/O speed — the oversized-corpus (GTA5-scale)
    # answer to the RAM cache's prefix ceiling. Stream is bit-identical
    # cache on/off/partial (tests/test_disk_cache.py).
    decode_disk_cache_gb: float = 0.0
    # override the cache location for read-only corpus mounts (default:
    # <data_root>/.mcseg_decode_cache/)
    decode_disk_cache_dir: str = ""
    # HBM-resident corpus (data/device_corpus.py): stage the decoded corpus
    # on-device once and feed steps by index — zero steady-state H2D traffic.
    # 'auto' enables it when the wire-format corpus fits device_corpus_gb
    # per device; stream order is bit-identical to the host pipeline.
    device_corpus: str = "auto"
    device_corpus_gb: float = 4.0
    # Strength of the controlled appearance shift applied by the
    # 'synthetic_shifted' corpus (datasets.SyntheticShiftedDataset):
    # deterministic per-class color rotation + illumination/noise change on
    # the TARGET domain while geometry and label distribution stay identical
    # to 'synthetic'. Drives the source-only-vs-MCD adaptation A/B — the
    # reference's headline behavior (SURVEY.md sections 3.2/6) demonstrated
    # without real corpora. 0 disables (shifted corpus == clean corpus).
    domain_shift: float = 1.0

    def to_dict(self):
        return _asdict(self)

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "DataConfig":
        d = {k: v for k, v in d.items() if k != "__class__"}
        for k in ("train_img_shape", "test_img_shape"):
            if k in d:
                d[k] = tuple(d[k])
        return DataConfig(**d)


@dataclass(frozen=True)
class TrainConfig:
    """Optimization + MCD hyperparameters — mirrors the reference's trainer
    flags (SURVEY.md section 3.2): `--num_k`, `--d_loss`, `--lr`, `--opt`,
    `--momentum`, `--weight_decay`, `--epochs`, `--resume`."""

    opt: str = "sgd"  # sgd | adam
    lr: float = 1e-3
    momentum: float = 0.9
    weight_decay: float = 2e-5
    epochs: int = 20
    num_k: int = 4  # generator (step C) repetitions per iteration
    d_loss: str = "diff"  # diff = mean|softmax1-softmax2| ; symkl
    lr_schedule: str = "poly"  # poly | constant | step
    lr_power: float = 0.9  # poly decay exponent (reference adjust_learning_rate)
    max_steps: int = 50_000  # schedule horizon
    seed: int = 0
    resume: str = ""
    out_dir: str = "./runs"
    log_every: int = 50
    tb_dir: str = ""  # optional TensorBoard event dir (reference's TB-style logger)
    checkpoint_every_epochs: int = 1
    # wall-clock budget in hours (0 = unbounded): when exceeded, the loop
    # exits through the same graceful path as SIGTERM — final `last`
    # checkpoint written, resumable with --resume (batch-scheduler contract)
    max_hours: float = 0.0
    # retention: keep only the newest N epoch checkpoints (epN.*), pruning
    # older ones after each save; 0 = keep all (reference behavior — one
    # checkpoint per epoch forever). `last` is never pruned.
    keep_checkpoints: int = 0
    # 2-D (data x space) mesh: shard activation HEIGHT over this many
    # devices in addition to batch data-parallelism (parallel/mesh.py
    # constrain_spatial — GSPMD inserts conv halo exchanges + cross-shard
    # BN/loss reductions). 1 = pure data parallel (default). Lets megapixel
    # geometries train below one image per chip of effective batch.
    spatial_devices: int = 1
    # epoch checkpoints serialize + write on a background thread
    # (utils/checkpoint.py AsyncCheckpointer) so the train loop never stalls
    # on disk; loops join before returning, and the final `last` save is
    # always synchronous. --sync_checkpoint turns this off.
    async_checkpoint: bool = True

    def to_dict(self):
        return _asdict(self)

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "TrainConfig":
        d = {k: v for k, v in d.items() if k != "__class__"}
        return TrainConfig(**d)


@dataclass(frozen=True)
class ExperimentConfig:
    """Bundle persisted into every checkpoint (the reference stores raw args;
    we store this dict — same round-trip contract)."""

    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)

    def to_dict(self):
        return {
            "model": self.model.to_dict(),
            "data": self.data.to_dict(),
            "train": self.train.to_dict(),
        }

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "ExperimentConfig":
        return ExperimentConfig(
            model=ModelConfig.from_dict(d["model"]),
            data=DataConfig.from_dict(d["data"]),
            train=TrainConfig.from_dict(d["train"]),
        )
