"""LYSTO data sources.

Semantics replicated from the reference's datasets
(reference: dataset/dataset.py:29-435), re-shaped for a device-resident
pipeline:

- k-fold split by ``(i+1) % kfold`` — fold members are the validation set
  (reference: dataset/dataset.py:110-112);
- organ filter compares the prefix before '_' (reference: :114);
- augmentation stores *flip codes*, not image copies: the reference appends
  each training image 4× with transformIDX 0..3 (identity/h/v/hv flips,
  reference: :70-97,118-120). We keep one uint8 copy and an index table
  (base_idx, flip_code) — 4× less host RAM and the flips run on device fused
  with normalization (see data/batches.py);
- hard-example resampling (``random_delete`` + ``add_data``,
  reference: :131-153) mutates the same index table.

Tiles are NOT stored: all images share one static grid (ops/tiles.py) and
tiles materialize on device.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from cellsegmentation_tpu.ops.categorize import categorize_np


def _load_h5(filepath: str, num_of_imgs: int = 0):
    import h5py

    with h5py.File(filepath, "r") as f:
        n = f["x"].shape[0]
        if num_of_imgs:
            n = min(n, num_of_imgs)
        images = np.asarray(f["x"][:n])
        organs = [o.decode("utf-8") for o in f["organ"][:n]]
        counts = np.asarray(f["y"][:n]) if "y" in f else None
    return images, organs, counts


class LystoDataSource:
    """Training/validation source over ``training.h5``.

    Exposes dense arrays: ``images`` (uint8, deduplicated), plus per-sample
    index tables ``base_idx``/``flip_code`` and labels. Batches are assembled
    by fancy-indexing ``images[base_idx[sel]]`` on the host and flipped /
    normalized on device.
    """

    FLIP_NONE, FLIP_H, FLIP_V, FLIP_HV = 0, 1, 2, 3

    def __init__(
        self,
        filepath: str,
        train: bool = True,
        kfold: Optional[int] = 10,
        organ: Optional[str] = None,
        augment: bool = False,
        shuffle: bool = False,
        num_of_imgs: int = 0,
        seed: int = 0,
    ):
        if kfold is not None and kfold <= 0:
            raise ValueError("kfold must be positive or None")
        images, organs, counts = _load_h5(filepath, num_of_imgs)
        if counts is None:
            raise ValueError(f"{filepath} has no 'y' labels; use LystoTestSource")

        keep = []
        for i in range(len(images)):
            if kfold is not None:
                in_val = (i + 1) % kfold == 0
                if (train and in_val) or (not train and not in_val):
                    continue
            if organ is not None and organs[i].partition("_")[0] != organ:
                continue
            keep.append(i)
        keep = np.asarray(keep, dtype=np.int64)

        self.images = images[keep]  # [M, H, W, 3] uint8, one copy per base image
        self.organs = [organs[i] for i in keep]
        base_counts = counts[keep].astype(np.int64)

        n_base = len(keep)
        reps = 4 if (train and augment) else 1
        # sample table: every base image, then its 3 flipped variants
        self.base_idx = np.tile(np.arange(n_base), reps)
        self.flip_code = np.repeat(np.arange(reps), n_base).astype(np.int32)
        # interleave reference-style (img0 aug0..3, img1 aug0..3, ...) is not
        # required — sample order is shuffled every epoch anyway.
        self.labels = np.tile(base_counts, reps)
        self.train = train
        self.augment = augment
        self._rng = np.random.default_rng(seed)

        if shuffle:
            order = self._rng.permutation(len(self.base_idx))
            self.base_idx = self.base_idx[order]
            self.flip_code = self.flip_code[order]
            self.labels = self.labels[order]

    # ---- basic accessors -------------------------------------------------
    def __len__(self) -> int:
        return len(self.base_idx)

    @property
    def cls_labels(self) -> np.ndarray:
        return categorize_np(self.labels)

    @property
    def image_hw(self) -> tuple[int, int]:
        return self.images.shape[1], self.images.shape[2]

    def gather_images(self, sample_indices: Sequence[int]) -> np.ndarray:
        """Host gather of the uint8 images for a set of samples."""
        sample_indices = np.asarray(sample_indices)
        return self.images[self.base_idx[sample_indices]]

    # ---- hard-example resampling (reference: :131-153, train_image.py:333-359)
    def random_delete(self, num: int) -> None:
        """Drop ``num`` random samples from the index table."""
        idx = self._rng.choice(len(self.base_idx), num, replace=False)
        mask = np.ones(len(self.base_idx), dtype=bool)
        mask[idx] = False
        self.base_idx = self.base_idx[mask]
        self.flip_code = self.flip_code[mask]
        self.labels = self.labels[mask]

    def add_samples(self, sample_indices: Sequence[int]) -> None:
        """Duplicate existing samples (hard examples) into the table."""
        sample_indices = np.asarray(sample_indices)
        self.append_rows(
            self.base_idx[sample_indices],
            self.flip_code[sample_indices],
            self.labels[sample_indices],
        )

    def snapshot_rows(self, sample_indices: Sequence[int]):
        """Copy (base_idx, flip, label) rows — safe across later mutation."""
        sample_indices = np.asarray(sample_indices)
        return (
            self.base_idx[sample_indices].copy(),
            self.flip_code[sample_indices].copy(),
            self.labels[sample_indices].copy(),
        )

    def append_rows(self, base_idx, flip_code, labels) -> None:
        self.base_idx = np.concatenate([self.base_idx, base_idx])
        self.flip_code = np.concatenate([self.flip_code, flip_code])
        self.labels = np.concatenate([self.labels, labels])


class SubsetSource:
    """A sample-index view over a LystoDataSource sharing its image stack."""

    def __init__(self, base: "LystoDataSource", sample_indices: Sequence[int]):
        sample_indices = np.asarray(sample_indices)
        self.images = base.images  # shared, not copied
        self.base_idx = base.base_idx[sample_indices]
        self.flip_code = base.flip_code[sample_indices]
        self.labels = base.labels[sample_indices]
        self.organs = [base.organs[base.base_idx[i]] for i in sample_indices]

    def __len__(self) -> int:
        return len(self.base_idx)

    @property
    def cls_labels(self) -> np.ndarray:
        return categorize_np(self.labels)

    @property
    def image_hw(self) -> tuple[int, int]:
        return self.images.shape[1], self.images.shape[2]

    def gather_images(self, sample_indices: Sequence[int]) -> np.ndarray:
        sample_indices = np.asarray(sample_indices)
        return self.images[self.base_idx[sample_indices]]


class EnsembleSource:
    """k-fold bagging splits (reference: dataset/dataset.py:292-343).

    One full LystoDataSource + per-fold contiguous train/val index lists:
    fold sizes are ⌈N/k⌉ for the first N%k folds and ⌊N/k⌋ after, matching
    the reference's divmod split (:306-316). ``fold(i)`` returns
    (train_view, val_view) sharing the single image stack (the reference
    deep-copies per fold; views are free).
    """

    def __init__(self, filepath: str, k: int = 10, augment: bool = False,
                 num_of_imgs: int = 0, seed: int = 0):
        self.data = LystoDataSource(
            filepath, train=True, kfold=None, augment=augment,
            num_of_imgs=num_of_imgs, seed=seed,
        )
        self.k = k
        n = len(self.data)
        size, extra = divmod(n, k)
        bounds = [0]
        for i in range(k):
            bounds.append(bounds[-1] + size + (1 if i < extra else 0))
        self._bounds = bounds

    def fold(self, idx: int) -> tuple[SubsetSource, SubsetSource]:
        lo, hi = self._bounds[idx], self._bounds[idx + 1]
        val_idx = np.arange(lo, hi)
        train_idx = np.concatenate(
            [np.arange(0, lo), np.arange(hi, self._bounds[-1])]
        )
        return SubsetSource(self.data, train_idx), SubsetSource(self.data, val_idx)


class LystoTestSource:
    """Unlabeled test source over ``test.h5`` (reference: dataset/dataset.py:346-435).

    Keeps original 1-based ids like the reference's LystoTestset (:381).
    """

    def __init__(
        self,
        filepath: str,
        organ: Optional[str] = None,
        num_of_imgs: int = 0,
    ):
        images, organs, counts = _load_h5(filepath, num_of_imgs)
        keep = []
        for i in range(len(images)):
            if organ is not None and organs[i].partition("_")[0] != organ:
                continue
            keep.append(i)
        keep = np.asarray(keep, dtype=np.int64)
        self.images = images[keep]
        self.organs = [organs[i] for i in keep]
        self.ids = keep + 1
        self.labels = counts[keep] if counts is not None else None

    def __len__(self) -> int:
        return len(self.images)

    @property
    def image_hw(self) -> tuple[int, int]:
        return self.images.shape[1], self.images.shape[2]
