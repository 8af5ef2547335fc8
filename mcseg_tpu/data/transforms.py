"""Host-side joint transforms (phase-1 correctness path + test oracle).

Counterpart of the reference's ``transform.py`` (SURVEY.md section 2): Scale
(bilinear for image / nearest for label), joint random crop + horizontal flip
applied identically to image and label, ToLabel/ReLabel, per-channel
normalize, Colorize.

In the TPU-native pipeline these run *on device*, fused (see
``mcseg_tpu.ops.preprocess``); this module is the reference-semantics host
implementation used (a) as the numerical oracle in tests, (b) as a fallback
when feeding pre-processed float batches, and (c) for PNG dumps.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from PIL import Image

# ImageNet statistics — the reference normalizes RGB (and HHA, which is
# encoded into an image-like 3-channel range) with torchvision's constants.
RGB_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
RGB_STD = np.array([0.229, 0.224, 0.225], np.float32)
HHA_MEAN = RGB_MEAN
HHA_STD = RGB_STD


def scale_image(img: np.ndarray, size_wh: Tuple[int, int]) -> np.ndarray:
    """Bilinear resize (uint8 HWC) to (W, H)."""
    return np.asarray(Image.fromarray(img).resize(size_wh, Image.BILINEAR))


def scale_label(label: np.ndarray, size_wh: Tuple[int, int]) -> np.ndarray:
    """Nearest resize for labels — never interpolate class ids."""
    return np.asarray(Image.fromarray(label).resize(size_wh, Image.NEAREST))


def joint_random_crop_flip(
    img: np.ndarray,
    label: np.ndarray,
    crop_hw: Tuple[int, int],
    rng: np.random.RandomState,
    flip: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Identical geometric aug for image and label (the reference applies the
    same seed to both paths — SURVEY.md section 3.4)."""
    h, w = img.shape[:2]
    ch, cw = crop_hw
    if h < ch or w < cw:
        raise ValueError(f"crop {crop_hw} larger than image {(h, w)}")
    top = rng.randint(0, h - ch + 1)
    left = rng.randint(0, w - cw + 1)
    img = img[top : top + ch, left : left + cw]
    label = label[top : top + ch, left : left + cw]
    if flip and rng.rand() < 0.5:
        img = img[:, ::-1]
        label = label[:, ::-1]
    return np.ascontiguousarray(img), np.ascontiguousarray(label)


def normalize(img_u8: np.ndarray, mean: np.ndarray = RGB_MEAN, std: np.ndarray = RGB_STD) -> np.ndarray:
    """uint8 HWC -> float32 normalized (torchvision ToTensor + Normalize)."""
    x = img_u8.astype(np.float32) / 255.0
    return (x - mean) / std


def normalize_multichannel(img_u8: np.ndarray) -> np.ndarray:
    """Normalize a stacked multichannel (3/4/6-ch) uint8 image. RGB stats on
    channels 0:3, HHA stats on 3:6; a bare 4th depth channel uses mean .5/std .25."""
    c = img_u8.shape[-1]
    if c == 3:
        return normalize(img_u8)
    if c == 6:
        rgb = normalize(img_u8[..., :3], RGB_MEAN, RGB_STD)
        hha = normalize(img_u8[..., 3:], HHA_MEAN, HHA_STD)
        return np.concatenate([rgb, hha], axis=-1)
    if c == 4:
        rgb = normalize(img_u8[..., :3], RGB_MEAN, RGB_STD)
        d = (img_u8[..., 3:].astype(np.float32) / 255.0 - 0.5) / 0.25
        return np.concatenate([rgb, d], axis=-1)
    if c == 1:
        return (img_u8.astype(np.float32) / 255.0 - 0.5) / 0.25
    raise ValueError(f"unsupported channel count {c}")


def colorize(label: np.ndarray, palette: np.ndarray, ignore: int = 255) -> np.ndarray:
    """Class-id map -> RGB uint8 via palette; ignore -> black. The reference's
    ``transform.Colorize`` for qualitative dumps."""
    out = np.zeros((*label.shape, 3), np.uint8)
    valid = label != ignore
    clipped = np.clip(label, 0, len(palette) - 1)
    out[valid] = palette[clipped[valid]]
    return out


def save_label_png(label: np.ndarray, path: str) -> None:
    Image.fromarray(label.astype(np.uint8)).save(path)


def save_color_png(label: np.ndarray, palette: np.ndarray, path: str) -> None:
    Image.fromarray(colorize(label, palette)).save(path)
