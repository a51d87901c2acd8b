"""Metrics: tile error rates, quadratic weighted kappa, point matching.

QWK is the headline LYSTO metric (reference README claims 0.9319). The
reference computes it with O(K²) Python loops over a list-of-lists confusion
matrix (reference: metrics/quadratic_weighted_kappa.py:38-85). Here:

- `quadratic_weighted_kappa` — vectorized NumPy for host-side evaluation,
  same min/max-rating inference semantics as the reference;
- `qwk_device` — fully on-device: the confusion matrix is a one-hot matmul
  (an MXU op) so distributed eval can psum per-shard confusion matrices and
  compute kappa without gathering predictions to the host.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def calc_map(pred, real) -> float:
    """Average-precision score (reference: metrics/metrics.py:19-20 wraps
    sklearn; argument order preserved, quirk included: the reference passes
    predictions as y_true)."""
    from sklearn import metrics as skm

    return float(skm.average_precision_score(np.asarray(pred), np.asarray(real)))


def calc_err(pred, real) -> tuple[float, float, float]:
    """Tile error rate, FPR, FNR (reference: metrics/metrics.py:7-16)."""
    pred = np.asarray(pred)
    real = np.asarray(real)
    neq = np.not_equal(pred, real)
    err = float(neq.sum()) / pred.shape[0]
    fpr = float(np.logical_and(pred == 1, neq).sum()) / max((real == 0).sum(), 1)
    fnr = float(np.logical_and(pred == 0, neq).sum()) / max((real == 1).sum(), 1)
    return err, fpr, fnr


def _kappa_from_confusion(conf: np.ndarray) -> float:
    k = conf.shape[0]
    n = conf.sum()
    if k <= 1:
        return 1.0
    idx = np.arange(k)
    w = (idx[:, None] - idx[None, :]) ** 2 / (k - 1) ** 2
    hist_a = conf.sum(axis=1)
    hist_b = conf.sum(axis=0)
    expected = np.outer(hist_a, hist_b) / n
    denom = (w * expected).sum()
    if denom == 0:
        return 1.0
    return float(1.0 - (w * conf).sum() / denom)


def quadratic_weighted_kappa(rater_a, rater_b, min_rating=None, max_rating=None) -> float:
    """QWK between two integer rating vectors.

    Rating-range inference matches the reference (min/max over both raters
    when not given, reference: metrics/quadratic_weighted_kappa.py:62-65).
    """
    a = np.asarray(rater_a, dtype=int)
    b = np.asarray(rater_b, dtype=int)
    assert a.shape == b.shape
    if min_rating is None:
        min_rating = int(min(a.min(), b.min()))
    if max_rating is None:
        max_rating = int(max(a.max(), b.max()))
    k = max_rating - min_rating + 1
    conf = np.zeros((k, k), dtype=np.float64)
    np.add.at(conf, (a - min_rating, b - min_rating), 1)
    return _kappa_from_confusion(conf)


def qwk_device(
    pred: jnp.ndarray, target: jnp.ndarray, num_ratings: int
) -> jnp.ndarray:
    """On-device QWK over a fixed rating range [0, num_ratings).

    The confusion matrix is built as onehot(pred)ᵀ @ onehot(target); under a
    sharded batch each device reduces its shard and XLA psums the [K, K]
    matrix — O(K²) bytes of collective traffic instead of gathering the
    whole prediction vector.
    """
    onehot_a = _one_hot(pred, num_ratings)
    onehot_b = _one_hot(target, num_ratings)
    conf = jnp.matmul(onehot_a.T, onehot_b, preferred_element_type=jnp.float32)
    idx = jnp.arange(num_ratings, dtype=jnp.float32)
    w = (idx[:, None] - idx[None, :]) ** 2 / (num_ratings - 1) ** 2
    n = jnp.sum(conf)
    hist_a = jnp.sum(conf, axis=1)
    hist_b = jnp.sum(conf, axis=0)
    expected = jnp.outer(hist_a, hist_b) / n
    denom = jnp.sum(w * expected)
    return 1.0 - jnp.sum(w * conf) / denom


def _one_hot(x: jnp.ndarray, k: int) -> jnp.ndarray:
    return (x[..., None].astype(jnp.int32) == jnp.arange(k, dtype=jnp.int32)).astype(
        jnp.float32
    )


def _weighted_kappa(a, b, weight_fn, min_rating=None, max_rating=None) -> float:
    a = np.asarray(a, dtype=int)
    b = np.asarray(b, dtype=int)
    if min_rating is None:
        min_rating = int(min(a.min(), b.min()))
    if max_rating is None:
        max_rating = int(max(a.max(), b.max()))
    k = max_rating - min_rating + 1
    conf = np.zeros((k, k), dtype=np.float64)
    np.add.at(conf, (a - min_rating, b - min_rating), 1)
    idx = np.arange(k)
    w = weight_fn(idx[:, None], idx[None, :], k)
    n = conf.sum()
    expected = np.outer(conf.sum(axis=1), conf.sum(axis=0)) / n
    denom = (w * expected).sum()
    return 1.0 if denom == 0 else float(1.0 - (w * conf).sum() / denom)


def linear_weighted_kappa(rater_a, rater_b, min_rating=None, max_rating=None) -> float:
    """|i-j| weights (reference: metrics/quadratic_weighted_kappa.py:88-134)."""
    return _weighted_kappa(
        rater_a, rater_b, lambda i, j, k: np.abs(i - j) / max(k - 1, 1),
        min_rating, max_rating,
    )


def unweighted_kappa(rater_a, rater_b, min_rating=None, max_rating=None) -> float:
    """0/1 disagreement weights (reference: metrics/quadratic_weighted_kappa.py:136-185)."""
    return _weighted_kappa(
        rater_a, rater_b, lambda i, j, k: (i != j).astype(float),
        min_rating, max_rating,
    )


def mean_quadratic_weighted_kappa(kappas, weights=None) -> float:
    """Fisher-z averaged kappas, capped to (-0.999, 0.999)
    (reference: metrics/quadratic_weighted_kappa.py:188-214)."""
    kappas = np.clip(np.asarray(kappas, dtype=float), -0.999, 0.999)
    if weights is None:
        weights = np.ones_like(kappas)
    else:
        weights = np.asarray(weights, dtype=float)
        weights = weights / np.mean(weights)
    z = np.mean(0.5 * np.log((1 + kappas) / (1 - kappas)) * weights)
    return float((np.exp(2 * z) - 1) / (np.exp(2 * z) + 1))


def weighted_mean_quadratic_weighted_kappa(labels, preds, groups, group_weights=None) -> float:
    """Grouped QWK averaged in Fisher-z space.

    Generalizes the reference's pandas-bound wmqwk (which hard-codes Kaggle
    essay columns and the long-removed DataFrame.irow; reference:
    metrics/quadratic_weighted_kappa.py:217-228) to plain arrays: compute one
    QWK per group id and Fisher-average them.
    """
    labels = np.asarray(labels)
    preds = np.asarray(preds)
    groups = np.asarray(groups)
    uniq = np.unique(groups)
    kappas = [
        quadratic_weighted_kappa(labels[groups == g], preds[groups == g]) for g in uniq
    ]
    weights = None
    if group_weights is not None:
        weights = [group_weights[g] for g in uniq]
    return mean_quadratic_weighted_kappa(kappas, weights)


def euclid_dist(p1, p2) -> float:
    """Euclidean distance between two points (reference: metrics/metrics.py:56-57)."""
    return float(np.sqrt(sum((d1 - d2) ** 2 for d1, d2 in zip(p1, p2))))


def precision_recall(tp, fp, fn, return_f1: bool = False):
    """P/R(/F1) with the reference's empty-set conventions: a zero denominator
    yields 1 for P and R, 0 for F1 (reference: metrics/metrics.py:60-66)."""
    p = 1 if tp + fp == 0 else tp / (tp + fp)
    r = 1 if tp + fn == 0 else tp / (tp + fn)
    if return_f1:
        return p, r, 0 if p + r == 0 else (2 * p * r) / (p + r)
    return p, r
