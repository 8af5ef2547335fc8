"""Label spaces, remap tables, and palettes.

Counterpart of the reference's per-corpus label remapping inside
``datasets.py`` + ``transform.ReLabel`` + ``transform.Colorize``
(SURVEY.md section 2). Two label spaces:

  * Cityscapes 19 train classes (GTA5 + Cityscapes, the standard id->trainId
    table from the Cityscapes toolkit; unused ids -> 255 ignore).
  * NYUDv2-40 (SUNCG renders + NYUDv2; raw label 0 = void -> 255, 1..40 -> 0..39).

Remaps are dense int lookup tables so they run as one vectorized gather on
device or host.
"""

from __future__ import annotations

import numpy as np

IGNORE = 255

# ---------------------------------------------------------------- Cityscapes
CITYSCAPES_NAMES = (
    "road", "sidewalk", "building", "wall", "fence", "pole", "light", "sign",
    "vegetation", "terrain", "sky", "person", "rider", "car", "truck", "bus",
    "train", "motocycle", "bicycle",
)

# full-id -> trainId (Cityscapes labels.py convention)
_CITY_ID_TO_TRAIN = {
    7: 0, 8: 1, 11: 2, 12: 3, 13: 4, 17: 5, 19: 6, 20: 7, 21: 8, 22: 9,
    23: 10, 24: 11, 25: 12, 26: 13, 27: 14, 28: 15, 31: 16, 32: 17, 33: 18,
}

CITYSCAPES_PALETTE = np.array(
    [
        (128, 64, 128), (244, 35, 232), (70, 70, 70), (102, 102, 156),
        (190, 153, 153), (153, 153, 153), (250, 170, 30), (220, 220, 0),
        (107, 142, 35), (152, 251, 152), (70, 130, 180), (220, 20, 60),
        (255, 0, 0), (0, 0, 142), (0, 0, 70), (0, 60, 100), (0, 80, 100),
        (0, 0, 230), (119, 11, 32),
    ],
    dtype=np.uint8,
)


def cityscapes_id_to_train_table() -> np.ndarray:
    """[256] uint8 lookup: raw Cityscapes/GTA5 label id -> train id or 255."""
    table = np.full(256, IGNORE, dtype=np.uint8)
    for k, v in _CITY_ID_TO_TRAIN.items():
        table[k] = v
    return table


# -------------------------------------------------------------------- SYNTHIA
# SYNTHIA-RAND-CITYSCAPES ids -> Cityscapes train ids (the standard 16-class
# UDA subset used across the MCD-era literature; terrain/truck/train have no
# SYNTHIA counterpart and stay ignored). Flagged [?] in SURVEY.md — verify
# against the reference once readable.
_SYNTHIA_TO_CITY_TRAIN = {
    1: 10, 2: 2, 3: 0, 4: 1, 5: 4, 6: 8, 7: 5, 8: 13, 9: 7, 10: 11,
    11: 18, 12: 17, 15: 6, 17: 12, 19: 15, 21: 3,
}


def synthia_to_train_table() -> np.ndarray:
    table = np.full(256, IGNORE, dtype=np.uint8)
    for k, v in _SYNTHIA_TO_CITY_TRAIN.items():
        table[k] = v
    return table


# ------------------------------------------------------------------- NYU-40
NYU40_NAMES = (
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "bookshelf", "picture", "counter", "blinds", "desk", "shelves",
    "curtain", "dresser", "pillow", "mirror", "floor_mat", "clothes",
    "ceiling", "books", "refridgerator", "television", "paper", "towel",
    "shower_curtain", "box", "whiteboard", "person", "night_stand", "toilet",
    "sink", "lamp", "bathtub", "bag", "otherstructure", "otherfurniture",
    "otherprop",
)


def nyu40_raw_to_train_table() -> np.ndarray:
    """[256] uint8 lookup: raw NYU40/SUNCG label (0=void, 1..40) -> 0..39 / 255."""
    table = np.full(256, IGNORE, dtype=np.uint8)
    for raw in range(1, 41):
        table[raw] = raw - 1
    return table


def voc_style_palette(n: int) -> np.ndarray:
    """Deterministic palette via the classic PASCAL-VOC bit-shuffle; used for
    NYU-40 colorized dumps (any fixed palette works — the reference's
    Colorize just needs a stable class->RGB map)."""
    pal = np.zeros((n, 3), dtype=np.uint8)
    for i in range(n):
        lab, r = i, np.zeros(3, np.uint16)
        for j in range(8):
            r[0] |= ((lab >> 0) & 1) << (7 - j)
            r[1] |= ((lab >> 1) & 1) << (7 - j)
            r[2] |= ((lab >> 2) & 1) << (7 - j)
            lab >>= 3
        pal[i] = r.astype(np.uint8)
    return pal


NYU40_PALETTE = voc_style_palette(40)


def remap(label: np.ndarray, table: np.ndarray) -> np.ndarray:
    """Vectorized label remap (one gather)."""
    return table[label.astype(np.int64)]


def cityscapes_train_to_id_table() -> np.ndarray:
    """[256] uint8 lookup: train id -> full Cityscapes label id (the inverse
    of cityscapes_id_to_train_table); 255/ignore -> 0 ("unlabeled"). The
    official Cityscapes evaluation server scores labelIds PNGs at native
    2048x1024 resolution, so submission dumps remap argmax train ids through
    this before saving."""
    table = np.zeros(256, dtype=np.uint8)
    for k, v in _CITY_ID_TO_TRAIN.items():
        table[v] = k
    return table


def get_submit_table(dataset: str):
    """Prediction remap for official-submission dumps (tester --submit_dir),
    or None when the corpus has no submission protocol. Only Cityscapes has
    an evaluation server among the reference's corpora."""
    if dataset.lower() in ("city", "cityscapes"):
        return cityscapes_train_to_id_table()
    return None


def get_label_spec(dataset: str):
    """(n_class, remap_table, names, palette) per corpus."""
    d = dataset.lower()
    if d == "synthia":
        return 19, synthia_to_train_table(), CITYSCAPES_NAMES, CITYSCAPES_PALETTE
    if d in ("city", "cityscapes", "gta", "gta5", "ir"):
        return 19, cityscapes_id_to_train_table(), CITYSCAPES_NAMES, CITYSCAPES_PALETTE
    if d in ("nyu", "nyudv2", "suncg", "synthetic", "synthetic_shifted"):
        return 40, nyu40_raw_to_train_table(), NYU40_NAMES, NYU40_PALETTE
    raise ValueError(f"unknown dataset {dataset!r}")
