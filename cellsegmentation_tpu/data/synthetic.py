"""Synthetic LYSTO-format fixtures for tests and smoke runs.

The real dataset is ``training.h5`` with keys ``organ`` (bytes like
b"colon_1"), ``x`` (uint8 [N,299,299,3]) and ``y`` (int counts)
(reference: dataset/dataset.py:59-60,104). The generator draws dark blobs on
a bright background so that counting/segmentation are learnable signals and
the HSV V<=170 refinement actually separates cells from background.
"""

from __future__ import annotations

import numpy as np

ORGANS = ("colon", "breast", "prostate")


def make_synthetic_h5(
    path: str,
    n_images: int = 64,
    image_size: int = 299,
    max_cells: int = 30,
    seed: int = 0,
    with_labels: bool = True,
    cell_r2: tuple = (9, 36),
) -> dict:
    """Write a LYSTO-schema h5 file; returns the arrays for convenience."""
    import h5py

    rng = np.random.default_rng(seed)
    images = np.full((n_images, image_size, image_size, 3), 220, dtype=np.uint8)
    counts = np.zeros(n_images, dtype=np.int64)
    organs = []
    centers: list[np.ndarray] = []

    for i in range(n_images):
        organ = ORGANS[i % len(ORGANS)]
        organs.append(f"{organ}_{i % 4}".encode())
        n_cells = int(rng.integers(0, max_cells + 1))
        if rng.random() < 0.2:
            n_cells = 0  # keep a healthy share of negative images
        counts[i] = n_cells
        pts = rng.integers(8, image_size - 8, size=(n_cells, 2))
        centers.append(pts)
        yy, xx = np.mgrid[0:image_size, 0:image_size]
        for cy, cx in pts:
            blob = (yy - cy) ** 2 + (xx - cx) ** 2 <= rng.integers(*cell_r2)
            # dark DAB-brown-ish cells on a bright background
            images[i][blob] = rng.integers(40, 110, size=3, dtype=np.uint8)
        noise = rng.integers(-12, 12, size=images[i].shape)
        images[i] = np.clip(images[i].astype(np.int32) + noise, 0, 255).astype(np.uint8)

    with h5py.File(path, "w") as f:
        f.create_dataset("organ", data=organs)
        f.create_dataset("x", data=images)
        if with_labels:
            f.create_dataset("y", data=counts)

    return {"images": images, "counts": counts, "organs": organs, "centers": centers}
