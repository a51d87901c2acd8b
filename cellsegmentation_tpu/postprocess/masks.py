"""Pseudo-mask generation, HSV refinement, heatmaps, overlays.

Spec from the reference (utils/image_processing.py):
- generate_masks (:79-111): paint a tile_size² block of 1s at every kept
  tile coordinate per image; optionally refine; save rgb/ + mask/ png trees;
- preprocess_masks (:114-124): AND the mask with the inverted V>170
  binarization, then remove objects <400 px and holes <120 px;
- heatmap (:146-167): per-tile prob painted into an image-sized mask
  (overlapping tiles overwrite, later tiles win), JET colormap, 50/50 blend,
  per-tile CSV rows.

TPU-native twist: block painting is a corner-increment + 2-D cumsum (an
integral-image trick) — one vectorized pass on device for the whole batch
instead of a Python loop per tile.
"""

from __future__ import annotations

import csv
import os
import shutil
from typing import Optional, Sequence

import numpy as np

from cellsegmentation_tpu.postprocess.morphology import (
    remove_small_regions,
    remove_small_regions_batch,
)


def paint_tile_blocks(
    n_images: int,
    image_hw: tuple[int, int],
    groups: np.ndarray,
    tiles_xy: np.ndarray,
    tile_size: int,
) -> np.ndarray:
    """[N, H, W] bool masks with a tile_size² block of 1s per kept tile.

    Corner-increment + cumsum: +1 at (x, y), -1 at (x, y+ts) / (x+ts, y),
    +1 at (x+ts, y+ts), double cumsum, >0. Equivalent to the reference's
    per-tile block writes (utils/image_processing.py:93-98) for 0/1 masks.
    """
    h, w = image_hw
    inc = np.zeros((n_images, h + 1, w + 1), dtype=np.int32)
    xs = tiles_xy[:, 0].astype(np.int64)
    ys = tiles_xy[:, 1].astype(np.int64)
    g = groups.astype(np.int64)
    np.add.at(inc, (g, xs, ys), 1)
    np.add.at(inc, (g, xs, ys + tile_size), -1)
    np.add.at(inc, (g, xs + tile_size, ys), -1)
    np.add.at(inc, (g, xs + tile_size, ys + tile_size), 1)
    filled = inc.cumsum(axis=1).cumsum(axis=2)[:, :h, :w]
    return filled > 0


def preprocess_masks(img: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Single-image HSV refinement (reference: utils/image_processing.py:114-124).

    V = max(channels) (channel-order invariant, so the reference's
    BGR-flag-on-RGB quirk is inherently preserved); keep mask pixels with
    V <= 170; drop objects <400 px; fill holes <120 px.
    """
    v = img.max(axis=-1)
    refined = np.logical_and(mask.astype(bool), v <= 170)
    return remove_small_regions(refined, min_object_size=400, hole_area_threshold=120)


def preprocess_masks_batch(images: np.ndarray, masks: np.ndarray) -> np.ndarray:
    """[N,H,W,3] × [N,H,W] batched refinement (one native morphology call)."""
    v = images.max(axis=-1)
    refined = np.logical_and(masks.astype(bool), v <= 170)
    return remove_small_regions_batch(refined, 400, 120)


def save_mask_pairs(
    output_path: str,
    rows: np.ndarray,
    images: np.ndarray,
    masks: np.ndarray,
) -> None:
    """Write the rgb/{row+1:05}.png + mask/{row+1:05}.png pair trees (the
    reference's pseudomask layout, utils/image_processing.py:100-110).
    ``rows`` are GLOBAL 0-based row indices for the [B, ...] images/masks:
    streamed callers (trainers.draw_pseudo_masks) pass each batch's rows so
    uneven batches keep the same global 1-based naming a whole-set save
    produces."""
    import cv2

    os.makedirs(os.path.join(output_path, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(output_path, "mask"), exist_ok=True)
    for j, row in enumerate(np.asarray(rows)):
        cv2.imwrite(
            os.path.join(output_path, f"rgb/{row + 1:05}.png"),
            cv2.cvtColor(images[j], cv2.COLOR_RGB2BGR),
        )
        cv2.imwrite(
            os.path.join(output_path, f"mask/{row + 1:05}.png"),
            (masks[j] * 255).astype(np.uint8),
        )


def generate_masks(
    images: np.ndarray,
    groups: np.ndarray,
    tiles_xy: np.ndarray,
    tile_size: int,
    preprocess: bool = False,
    save_masks: bool = True,
    output_path: str = "./data/pseudomask",
) -> np.ndarray:
    """Pseudo-masks for stage-3 training (reference: utils/image_processing.py:79-111).

    images: [N, H, W, 3] uint8; groups/tiles_xy: kept tiles (image index +
    upper-left coords). Saves rgb/ and mask/ png trees when save_masks.
    """
    masks = paint_tile_blocks(
        len(images), images.shape[1:3], groups, tiles_xy, tile_size
    )
    if preprocess:
        masks = preprocess_masks_batch(images, masks)

    if save_masks:
        save_mask_pairs(output_path, np.arange(len(images)), images, masks)
    return masks.astype(np.uint8)


def heatmap(
    images: np.ndarray,
    groups: np.ndarray,
    tiles_xy: np.ndarray,
    probs: np.ndarray,
    tile_size: int,
    output_path: str,
    csv_path: Optional[str] = None,
) -> None:
    """Prob heatmap overlays (reference: utils/image_processing.py:146-167).

    Per-tile prob painted into an image-sized mask in tile order (later
    tiles overwrite), 255-inverted JET colormap, 50/50 blend, per-tile CSV.
    """
    import cv2

    os.makedirs(output_path, exist_ok=True)
    h, w = images.shape[1:3]
    masks = np.zeros((len(images), h, w), dtype=np.float32)
    writer = None
    if csv_path:
        f = open(csv_path, "w", newline="")
        writer = csv.writer(f)
    for i, g in enumerate(groups):
        x, y = int(tiles_xy[i, 0]), int(tiles_xy[i, 1])
        masks[g, x : x + tile_size, y : y + tile_size] = probs[i]
        if writer is not None:
            writer.writerow([g, f"[{x}, {y}]", probs[i]])
    if writer is not None:
        f.close()
    for i in range(len(images)):
        cmap = cv2.applyColorMap(
            255 - np.uint8(255 * masks[i]), cv2.COLORMAP_JET
        )
        blend = cv2.addWeighted(images[i], 0.5, cmap, 0.5, 0)
        cv2.imwrite(
            os.path.join(output_path, f"test_{i + 1:05}.png"),
            cv2.cvtColor(blend, cv2.COLOR_RGB2BGR),
        )


def overlap_mask(
    img: np.ndarray,
    mask: np.ndarray,
    postprocess: bool = True,
    min_object_size: int = 300,
    hole_area_threshold: int = 100,
    save: Optional[str] = None,
) -> np.ndarray:
    """50/50 blend of a binary mask onto RGB
    (reference: utils/image_processing.py:20-28)."""
    if postprocess:
        mask = remove_small_regions(mask, min_object_size, hole_area_threshold)
    img = img.copy()
    overlay = np.uint8(255 * mask.astype(np.uint8)) * 0.5
    for c in range(3):
        img[:, :, c] = img[:, :, c] * 0.5 + overlay
    if save is not None:
        import cv2

        cv2.imwrite(save, cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_RGB2BGR))
    return img


def save_images_with_masks(
    images: Sequence[np.ndarray],
    masks: Sequence[np.ndarray],
    threshold: float,
    output_path: str,
    soft: bool = False,
    start_index: int = 0,
) -> None:
    """Thresholded mask overlays + optional soft/ prob pngs
    (reference: utils/image_processing.py:170-191). ``start_index`` lets
    callers stream batches while keeping the 1-based file numbering."""
    import cv2

    os.makedirs(output_path, exist_ok=True)
    for i in range(len(images)):
        n = start_index + i + 1
        img = images[i].copy()
        classes = masks[i] > threshold
        if soft:
            soft_dir = os.path.join(output_path, "soft")
            os.makedirs(soft_dir, exist_ok=True)
            soft_map = np.uint8(255 * masks[i] * classes)
            cv2.imwrite(os.path.join(soft_dir, f"{n:05}.png"), soft_map)
            cmap = cv2.applyColorMap(255 - soft_map, cv2.COLORMAP_JET)
            img = cv2.addWeighted(img, 0.5, cmap, 0.5, 0)
        else:
            overlay = np.uint8(255 * classes) * 0.5
            for c in range(3):
                img[:, :, c] = img[:, :, c] * 0.5 + overlay
        cv2.imwrite(
            os.path.join(output_path, f"test_{n:05}.png"),
            cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_RGB2BGR),
        )


def dotting(img: np.ndarray, points, radius: int = 4, color=(255, 0, 0)) -> np.ndarray:
    """Draw detected cell centers as filled circles
    (reference: utils/image_processing.py:31-34)."""
    import cv2

    for x, y in points:
        img = cv2.circle(img, (int(x), int(y)), radius, color, cv2.FILLED)
    return img


def locate_cells(
    slide: np.ndarray, grids, discarded_grids=None
) -> np.ndarray:
    """Red kept / blue discarded center dots
    (reference: utils/image_processing.py:37-49)."""
    import cv2

    for y, x in grids:
        slide = cv2.circle(slide, (int(x), int(y)), 4, (255, 0, 0), cv2.FILLED)
    if discarded_grids is not None:
        for y, x in discarded_grids:
            slide = cv2.circle(slide, (int(x), int(y)), 4, (0, 0, 255), cv2.FILLED)
    return slide


def save_images(images: np.ndarray, organs, labels, prefix: str, output_path: str) -> None:
    """Export h5 images to pngs + an organ CSV
    (reference: utils/image_processing.py:52-76)."""
    import cv2

    os.makedirs(output_path, exist_ok=True)
    with open(os.path.join(output_path, f"{prefix}_organ.csv"), "w", newline="") as f:
        w = csv.writer(f)
        for i, img in enumerate(images):
            if labels is not None:
                name = f"{prefix}_{i + 1}_{labels[i]}cells.png"
                w.writerow([name, labels[i], organs[i]])
            else:
                name = f"{prefix}_{i + 1}.png"
                w.writerow([name, organs[i]])
            cv2.imwrite(
                os.path.join(output_path, name),
                cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_RGB2BGR),
            )


def crop_wsi(data_path: str, max_size: float = 5e7) -> None:
    """Recursively split oversized WSI pngs into vertical strips named
    ``<file>-<xorigin>.png`` (reference: utils/image_processing.py:194-222)."""
    import cv2

    backup_path = os.path.join(data_path, "backup")
    os.makedirs(backup_path, exist_ok=True)
    for fname in sorted(os.listdir(data_path)):
        fpath = os.path.join(data_path, fname)
        if not os.path.isfile(fpath) or os.path.getsize(fpath) <= max_size:
            continue
        wsi = cv2.imread(fpath, cv2.IMREAD_COLOR)
        stem = os.path.splitext(fname)[0]
        if stem.find("-") > 0:
            base, xo = stem.split("-", 1)
            xorigin = int(xo)
            borders = np.linspace(xorigin, xorigin + wsi.shape[1], 3, dtype=int)
            for i in range(2):
                cv2.imwrite(
                    os.path.join(data_path, f"{base}-{borders[i]}.png"),
                    wsi[:, borders[i] - xorigin : borders[i + 1] - xorigin],
                )
        else:
            borders = np.linspace(0, wsi.shape[1], 6, dtype=int)
            for i in range(5):
                cv2.imwrite(
                    os.path.join(data_path, f"{stem}-{borders[i]}.png"),
                    wsi[:, borders[i] : borders[i + 1]],
                )
            shutil.move(fpath, backup_path)
    for fname in sorted(os.listdir(data_path)):
        fpath = os.path.join(data_path, fname)
        if os.path.isfile(fpath) and os.path.getsize(fpath) > max_size:
            crop_wsi(data_path, max_size)
            break
