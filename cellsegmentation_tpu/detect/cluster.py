"""Mode-seeking cell localization.

Spec (reference: test_seg.py:319-365): smooth the stitched prob mask
(GaussianBlur 15×15 σ3 or a normalized distance transform), seed a 16×16
track window at every grid point whose center exceeds 0.2·255, mean-shift
each window to its local mass mode, merge converged centers with
DBSCAN(eps, min_samples=1), rank cluster means by mask value and keep the
top ``cell_count``.

TPU-era twist: the reference loops cv2.meanShift over thousands of windows
in Python. Mean-shift over a box window is just "re-center the window on its
mass centroid", so we run ALL windows simultaneously with three integral
images (Σm, Σx·m, Σy·m) giving O(1) box moments per window per iteration —
the whole cluster step is a handful of vectorized numpy passes.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from cellsegmentation_tpu.ops.tiles import tile_grid


def _integral(a: np.ndarray) -> np.ndarray:
    out = np.zeros((a.shape[0] + 1, a.shape[1] + 1), dtype=np.float64)
    np.cumsum(np.cumsum(a, axis=0), axis=1, out=out[1:, 1:])
    return out


def _box_sums(ii: np.ndarray, x0, y0, size: int):
    return (
        ii[x0 + size, y0 + size] - ii[x0, y0 + size] - ii[x0 + size, y0] + ii[x0, y0]
    )


def vectorized_meanshift(
    mask: np.ndarray,
    windows_xy: np.ndarray,
    window_size: int,
    max_iter: int = 100,
) -> np.ndarray:
    """Shift every [x, y]-cornered box to its local mass mode simultaneously.

    Returns the final window centers [K, 2] (x, y). Windows with zero mass
    stay put (cv2.meanShift behavior).
    """
    h, w = mask.shape
    m = mask.astype(np.float64)
    ii = _integral(m)
    xs = np.arange(h, dtype=np.float64)
    ys = np.arange(w, dtype=np.float64)
    ii_x = _integral(m * xs[:, None])
    ii_y = _integral(m * ys[None, :])

    x0 = windows_xy[:, 0].astype(np.int64).copy()
    y0 = windows_xy[:, 1].astype(np.int64).copy()
    x0 = np.clip(x0, 0, h - window_size)
    y0 = np.clip(y0, 0, w - window_size)
    active = np.ones(len(x0), dtype=bool)

    for _ in range(max_iter):
        if not active.any():
            break
        ax0, ay0 = x0[active], y0[active]
        m00 = _box_sums(ii, ax0, ay0, window_size)
        m10 = _box_sums(ii_x, ax0, ay0, window_size)
        m01 = _box_sums(ii_y, ax0, ay0, window_size)
        has_mass = m00 > 0
        cx = np.where(has_mass, m10 / np.maximum(m00, 1e-12), ax0 + window_size / 2)
        cy = np.where(has_mass, m01 / np.maximum(m00, 1e-12), ay0 + window_size / 2)
        nx0 = np.clip(np.round(cx - window_size / 2).astype(np.int64), 0, h - window_size)
        ny0 = np.clip(np.round(cy - window_size / 2).astype(np.int64), 0, w - window_size)
        moved = (nx0 != ax0) | (ny0 != ay0)
        x0[active], y0[active] = nx0, ny0
        still = np.zeros_like(active)
        still[np.nonzero(active)[0][moved]] = True
        active = still

    centers = np.stack([x0 + window_size // 2, y0 + window_size // 2], axis=1)
    return centers


def meanshift_cluster(
    mask: np.ndarray,
    method: str = "gaussianblur",
    cell_count: Optional[int] = None,
    thr_for_setting_points: float = 0.2,
    window_size: int = 16,
    interval: int = 10,
    eps: float = 15,
    **method_kwargs,
):
    """Full localization pass over one stitched uint8 mask.

    Returns (kept_centers [K,2] as (x, y), discarded_centers).
    """
    import cv2
    from sklearn.cluster import DBSCAN

    if method == "gaussianblur":
        kwargs = method_kwargs or {"ksize": (15, 15), "sigmaX": 3}
        smoothed = cv2.GaussianBlur(mask, **kwargs)
    elif method == "distancetransform":
        thr_for_dt = 10
        kwargs = method_kwargs or {
            "distanceType": cv2.DIST_L2,
            "maskSize": cv2.DIST_MASK_PRECISE,
        }
        dt = cv2.distanceTransform(
            np.asarray((mask > thr_for_dt) * 255, dtype=np.uint8), **kwargs
        )
        dt = cv2.normalize(dt, dt, 0, 1, cv2.NORM_MINMAX) * 255
        smoothed = np.round(dt).astype(np.uint8)
    else:
        raise ValueError(f"smoothing method {method!r} not found")

    h, w = smoothed.shape[:2]
    if h < window_size or w < window_size:
        return np.zeros((0, 2), dtype=int), np.zeros((0, 2), dtype=int)
    grid = tile_grid(h, w, window_size, interval)
    half = window_size // 2
    centers_val = smoothed[grid[:, 0] + half, grid[:, 1] + half]
    seeds = grid[centers_val > thr_for_setting_points * 255]
    if len(seeds) == 0:
        return np.zeros((0, 2), dtype=int), np.zeros((0, 2), dtype=int)

    centers = vectorized_meanshift(smoothed, seeds, window_size)

    labels = DBSCAN(eps=eps, min_samples=1).fit_predict(centers)
    merged = np.stack(
        [
            np.mean(centers[labels == i], axis=0).round().astype(int)
            for i in range(labels.max() + 1)
        ]
    )
    weights = smoothed[merged[:, 0], merged[:, 1]]
    merged = merged[np.argsort(weights)[::-1]]

    if cell_count is not None:
        return merged[:cell_count], merged[cell_count:]
    return merged, np.zeros((0, 2), dtype=int)
