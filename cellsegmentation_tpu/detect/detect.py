"""WSI/ROI cell detection: stream patches, stitch masks, localize, CSV out.

Spec (reference: test_seg.py:182-316): per patch batch, a segmentation
forward gives the positive-prob map AND an image-head forward gives the
patch's cell count (the reference flips setmode mid-batch; here they're just
two jitted programs over the same normalized batch). Per source image:
stitch 255·mask at the patch grid (later patches overwrite), accumulate the
count, then mean-shift-cluster and emit (image_id, x, y) rows with the
crop-offset correction for strip-split WSIs; on a crash the current image's
rows are rolled back and the run is resumable with resume_from.
"""

from __future__ import annotations

import csv
import os
import time
import traceback
from typing import Optional

import numpy as np

from cellsegmentation_tpu.data.masks import MaskTestSource
from cellsegmentation_tpu.detect.cluster import meanshift_cluster
from cellsegmentation_tpu.postprocess.masks import locate_cells


def _strip_offset(image_file: str) -> tuple[str, int]:
    """'name-1234' -> ('name', 1234); plain names have offset 0."""
    if image_file.find("-") > 0:
        base, xo = image_file.split("-", 1)
        try:
            return base, int(xo)
        except ValueError:
            return image_file, 0
    return image_file, 0


def cell_detect(
    testset: MaskTestSource,
    seg_infer,  # (variables, images u8, flip) -> [B, H, W] P(pos)
    image_infer,  # (variables, images u8, flip) -> (cls_probs, counts)
    variables,
    *,
    batch_size: int = 8,
    output_path: str = "./output",
    output_image: bool = True,
    method: str = "gaussianblur",
    eps: float = 15,
    resume: bool = False,
    **method_kwargs,
) -> str:
    """Run detection over every patch of every file; returns the CSV path."""
    import cv2
    import jax.numpy as jnp

    detect_path = os.path.join(output_path, "detect")
    os.makedirs(detect_path, exist_ok=True)
    if resume:
        import glob as _glob

        existing = sorted(_glob.glob(os.path.join(detect_path, "*-location.csv")))
        fpath = existing[-1]
        f = open(fpath, "a", newline="")
        writer = csv.writer(f)
    else:
        fpath = os.path.join(
            detect_path, time.strftime("%Y%m%d-%H%M%S") + "-location.csv"
        )
        f = open(fpath, "w", newline="")
        writer = csv.writer(f)
        writer.writerow(["image_id", "x", "y"])

    ps = testset.patch_size
    current_file: Optional[int] = None
    whole_mask: Optional[np.ndarray] = None
    cell_count = 0.0

    def flush_image(file_idx: int) -> None:
        nonlocal whole_mask, cell_count
        image_file = os.path.splitext(testset.files[file_idx])[0]
        cv2.imwrite(
            os.path.join(detect_path, f"mask_{image_file}.png"), whole_mask
        )
        kept, discarded = meanshift_cluster(
            whole_mask, method, int(cell_count), eps=eps, **method_kwargs
        )
        base, xoffset = _strip_offset(image_file)
        for x, y in kept:
            writer.writerow([base, int(x) + xoffset, int(y)])
        f.flush()
        if output_image:
            slide = testset.load_file(file_idx).astype(np.uint8).copy()
            slide = locate_cells(slide, kept, discarded)
            cv2.imwrite(
                os.path.join(
                    detect_path, f"{image_file}_{int(cell_count)}cells.png"
                ),
                cv2.cvtColor(slide, cv2.COLOR_RGB2BGR),
            )

    try:
        n = len(testset)
        for start in range(0, n, batch_size):
            idxs = list(range(start, min(start + batch_size, n)))
            patches = np.stack([testset.get_patch(i) for i in idxs])
            flip = jnp.zeros((len(idxs),), jnp.int32)
            masks = np.asarray(seg_infer(variables, jnp.asarray(patches), flip))
            _, counts = image_infer(variables, jnp.asarray(patches), flip)
            counts = np.round(np.asarray(counts)).astype(int)

            for i, patch_idx in enumerate(idxs):
                file_idx, x, y = testset.patch_index[patch_idx]
                if current_file is None or file_idx != current_file:
                    if current_file is not None:
                        flush_image(current_file)
                    current_file = file_idx
                    h, w = testset.image_sizes[file_idx]
                    whole_mask = np.zeros((h, w), dtype=np.uint8)
                    cell_count = 0.0
                mask_u8 = np.uint8(255 * masks[i])
                h, w = testset.image_sizes[file_idx]
                whole_mask[x : x + ps, y : y + ps] = mask_u8[
                    : max(0, min(ps, h - x)), : max(0, min(ps, w - y))
                ]
                cell_count += counts[i]

        if current_file is not None:
            flush_image(current_file)
        f.close()
    except Exception:
        # rollback: drop the partially-detected image's rows
        f.close()
        image_file = (
            os.path.splitext(testset.files[current_file])[0]
            if current_file is not None
            else None
        )
        base = _strip_offset(image_file)[0] if image_file else None
        tmp_path = os.path.join(detect_path, "tmp.csv")
        with open(fpath) as src, open(tmp_path, "w", newline="") as dst:
            w = csv.writer(dst)
            for row in csv.reader(src):
                if row and row[0] != base:
                    w.writerow(row)
        os.replace(tmp_path, fpath)
        traceback.print_exc()
        print(
            f"Exception caught; partial results kept in '{fpath}'. "
            f"Rerun with --resume_from {image_file}.<ext> to continue."
        )
    return fpath
