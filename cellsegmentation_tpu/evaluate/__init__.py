"""Stage evaluation (reference: evaluate.py).

- evaluate_tile: reconstructs per-tile ground truth by marking each image's
  top ``count*tiles_per_pos`` tiles (by predicted prob) positive, thresholds
  the probs, and reports err/FPR/FNR (reference: evaluate.py:8-27);
- evaluate_image: MSE over counts + QWK over *raw integer counts* (the
  reference feeds counts straight into qwk, not class bins;
  reference: evaluate.py:30-40). The mAP slot returns 0 for parity.
"""

from __future__ import annotations

import numpy as np

from cellsegmentation_tpu.ops.metrics import calc_err, quadratic_weighted_kappa


def evaluate_tile(
    labels: np.ndarray,
    probs: np.ndarray,
    tiles_per_pos: int,
    threshold: float,
) -> tuple[float, float, float]:
    """labels: [N] image counts; probs: [N, T] dense per-tile probs."""
    n, t = probs.shape
    ranks = np.argsort(np.argsort(probs, axis=1, kind="stable"), axis=1, kind="stable")
    k = np.minimum(labels * tiles_per_pos, t)[:, None]
    gt = (ranks >= t - k).astype(np.int64)
    pred = (probs > threshold).astype(np.int64)
    return calc_err(pred.reshape(-1), gt.reshape(-1))


def evaluate_image(
    labels: np.ndarray, categories: np.ndarray, counts: np.ndarray
) -> tuple[float, float, float]:
    """Returns (mAP placeholder 0, MSE, QWK) like the reference.

    The QWK confusion matrix is (max rating)² — a diverged regressor
    emitting a huge count would make it unallocatable, so counts are
    clipped to 2x the label range (min 500) for the kappa only. Any
    prediction past that cap is already in maximal-disagreement territory,
    and MSE (reported unclipped) carries the divergence signal."""
    counts = np.asarray(counts, dtype=np.float64)
    labels = np.asarray(labels, dtype=np.float64)
    mse = float(np.mean((counts - labels) ** 2))
    cap = max(500, 2 * int(labels.max(initial=0)))
    score = quadratic_weighted_kappa(
        counts.clip(0, cap).astype(int), labels.astype(int)
    )
    return 0.0, mse, score
