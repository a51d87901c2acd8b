"""Stage-3 datasets: pseudo-mask training set and the three test-set kinds.

Reference semantics:
- Maskset (reference: dataset/dataset.py:438-513): pairs training.h5 images
  with pseudo-masks from an ndarray or a mask/ png directory; returns
  (image, mask, count label);
- MaskTestset (:516-647): patch grids over three source kinds — WSIs
  (.svs/.tiff via OpenSlide, gated import), ROI images (.jpg/.png), or .h5
  patch files; stride = patch_size - 16 with border completion;
  ``resume_from`` file skip for crash recovery;
- PointTestset (:650-715): images/ masks/ points/ TSVs +
  image_type.csv cancer/area buckets, natural-sorted filenames.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from cellsegmentation_tpu.data.lysto import _load_h5
from cellsegmentation_tpu.ops.tiles import tile_grid
from cellsegmentation_tpu.utils.logging import sort_files


class MaskDataSource:
    """Images + pseudo-masks for seg-decoder training."""

    def __init__(
        self,
        filepath: str,
        masks,  # ndarray [N, H, W] or a pseudomask dir containing mask/
        num_of_imgs: int = 0,
        augment: bool = False,
    ):
        images, organs, counts = _load_h5(filepath, num_of_imgs)
        self.images = images
        self.organs = organs
        self.labels = counts
        self.augment = augment
        if isinstance(masks, (str, os.PathLike)):
            import cv2

            mask_dir = os.path.join(masks, "mask")
            files = sort_files(
                [f for f in os.listdir(mask_dir) if f.endswith(".png")]
            )
            loaded = [
                cv2.imread(os.path.join(mask_dir, f), cv2.IMREAD_GRAYSCALE)
                for f in files[: len(images)]
            ]
            self.masks = (np.stack(loaded) > 127).astype(np.uint8)
        else:
            self.masks = (np.asarray(masks) > 0).astype(np.uint8)[: len(images)]
        assert len(self.masks) == len(self.images), "mask/image count mismatch"
        # flip codes for optional augmentation (0 = none); per-epoch random
        # flips are drawn by the trainer when augment=True
        self.flip_code = np.zeros(len(self.images), dtype=np.int32)
        self.base_idx = np.arange(len(self.images))

    def __len__(self) -> int:
        return len(self.images)

    @property
    def image_hw(self) -> tuple[int, int]:
        return self.images.shape[1], self.images.shape[2]


class MaskTestSource:
    """Patch-grid test source over WSIs / ROI images / h5 patches.

    Patches are enumerated as (file index, x, y) with stride
    ``patch_size - 16`` and border completion (reference:
    dataset/dataset.py:540,548,577-612); images load lazily per file.
    """

    WSI_EXT = (".svs", ".tiff")
    ROI_EXT = (".jpg", ".png")

    def __init__(
        self,
        filepath: str,
        patch_size: int = 299,
        resume_from: Optional[str] = None,
        num_of_imgs: int = 0,
    ):
        self.filepath = filepath
        self.patch_size = patch_size
        self.stride = patch_size - 16
        self.mode: str
        self.files: list[str] = []
        self.patch_index: list[tuple[int, int, int]] = []  # (fileidx, x, y)
        self.image_sizes: list[tuple[int, int]] = []

        if os.path.isdir(filepath):
            entries = sort_files(
                [
                    f
                    for f in os.listdir(filepath)
                    if f.lower().endswith(self.WSI_EXT + self.ROI_EXT)
                ]
            )
            if num_of_imgs:
                entries = entries[:num_of_imgs]
            skipping = resume_from is not None
            for f in entries:
                if skipping:
                    if f == resume_from:
                        skipping = False
                    else:
                        continue
                self.files.append(f)
            self.mode = (
                "wsi"
                if self.files and self.files[0].lower().endswith(self.WSI_EXT)
                else "roi"
            )
            for fi, fname in enumerate(self.files):
                h, w = self._file_hw(fname)
                self.image_sizes.append((h, w))
                for x, y in self._grid(h, w):
                    self.patch_index.append((fi, x, y))
        elif filepath.endswith(".h5"):
            self.mode = "h5"
            images, organs, _ = _load_h5(filepath, num_of_imgs)
            self.images = images
            self.organs = organs
            # synthetic per-image names so detection outputs (mask pngs,
            # location CSV rows) work uniformly across source kinds
            self.files = [f"{i + 1:05}.h5img" for i in range(len(images))]
            self.image_sizes = [images.shape[1:3]] * len(images)
            for i in range(len(images)):
                self.patch_index.append((i, 0, 0))
        else:
            raise ValueError(f"unsupported test path: {filepath}")
        self._cache: tuple[Optional[int], Optional[np.ndarray]] = (None, None)

    def _file_hw(self, fname: str) -> tuple[int, int]:
        path = os.path.join(self.filepath, fname)
        if fname.lower().endswith(self.WSI_EXT):
            import openslide  # gated: only needed for WSI inputs

            with openslide.OpenSlide(path) as slide:
                w, h = slide.dimensions
            return h, w
        import cv2

        img = cv2.imread(path, cv2.IMREAD_COLOR)
        return img.shape[0], img.shape[1]

    def _grid(self, h: int, w: int):
        """Window starts with border completion; degenerates to a single
        full-image patch when the image is smaller than patch_size."""
        if h < self.patch_size or w < self.patch_size:
            return [(0, 0)]
        return [tuple(c) for c in tile_grid(h, w, self.patch_size, self.stride)]

    def __len__(self) -> int:
        return len(self.patch_index)

    @property
    def image_hw(self) -> tuple[int, int]:
        return (self.patch_size, self.patch_size)

    def load_file(self, file_idx: int) -> np.ndarray:
        """RGB pixels of one source file (lazy, LRU-1 cached — the reference
        reopens the slide per access, dataset.py:614-633)."""
        if self.mode == "h5":
            return self.images[file_idx]
        if self._cache[0] == file_idx:
            return self._cache[1]
        fname = self.files[file_idx]
        path = os.path.join(self.filepath, fname)
        if self.mode == "wsi":
            import openslide

            with openslide.OpenSlide(path) as slide:
                img = np.asarray(
                    slide.read_region((0, 0), 0, slide.dimensions).convert("RGB")
                )
        else:
            import cv2

            img = cv2.cvtColor(cv2.imread(path, cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)
        self._cache = (file_idx, img)
        return img

    def get_patch(self, patch_idx: int) -> np.ndarray:
        fi, x, y = self.patch_index[patch_idx]
        img = self.load_file(fi)
        ps = self.patch_size
        patch = img[x : x + ps, y : y + ps]
        if patch.shape[:2] != (ps, ps):  # small ROI: pad to the patch size
            pad = np.zeros((ps, ps, 3), dtype=patch.dtype)
            pad[: patch.shape[0], : patch.shape[1]] = patch
            patch = pad
        return patch


class PointTestSource:
    """Point-annotated eval set (reference: dataset/dataset.py:650-715).

    Layout: <root>/images/*.png, <root>/masks/*.png (optional),
    <root>/points/*.tsv with x<TAB>y rows, <root>/image_type.csv with
    (name, cancer_type, area_type) rows.
    """

    def __init__(self, root: str, num_of_imgs: int = 0):
        import cv2

        self.root = root
        img_dir = os.path.join(root, "images")
        names = sort_files([f for f in os.listdir(img_dir) if f.endswith(".png")])
        if num_of_imgs:
            names = names[:num_of_imgs]
        self.names = names
        self.images = np.stack(
            [
                cv2.cvtColor(
                    cv2.imread(os.path.join(img_dir, n), cv2.IMREAD_COLOR),
                    cv2.COLOR_BGR2RGB,
                )
                for n in names
            ]
        )
        mask_dir = os.path.join(root, "masks")
        self.masks = None
        if os.path.isdir(mask_dir):
            self.masks = np.stack(
                [
                    (
                        cv2.imread(
                            os.path.join(mask_dir, n), cv2.IMREAD_GRAYSCALE
                        )
                        > 127
                    ).astype(np.uint8)
                    for n in names
                ]
            )
        self.points: list[np.ndarray] = []
        point_dir = os.path.join(root, "points")
        for n in names:
            tsv = os.path.join(point_dir, os.path.splitext(n)[0] + ".tsv")
            if os.path.exists(tsv):
                pts = np.loadtxt(tsv, delimiter="\t", ndmin=2)
                self.points.append(pts.astype(np.int64))
            else:
                self.points.append(np.zeros((0, 2), dtype=np.int64))
        self.cancer_types: dict[str, str] = {}
        self.area_types: dict[str, str] = {}
        type_csv = os.path.join(root, "image_type.csv")
        if os.path.exists(type_csv):
            import csv as _csv

            with open(type_csv) as f:
                for row in _csv.reader(f):
                    if len(row) >= 3:
                        self.cancer_types[row[0]] = row[1]
                        self.area_types[row[0]] = row[2]
        self.flip_code = np.zeros(len(self.images), dtype=np.int32)
        self.base_idx = np.arange(len(self.images))

    def __len__(self) -> int:
        return len(self.images)

    @property
    def image_hw(self) -> tuple[int, int]:
        return self.images.shape[1], self.images.shape[2]
