"""NumPy oracles re-stating the reference's algorithms for parity tests.

These are *behavioral specifications* transcribed from reading the reference
(file:line cited per function), used only to pin our TPU implementations.
"""

from __future__ import annotations

import numpy as np


def get_tiles_oracle(h: int, w: int, interval: int, size: int) -> list[tuple[int, int]]:
    """Sliding-window coords with border completion
    (spec: reference dataset/dataset.py:718-742)."""
    tiles: list[tuple[int, int]] = []
    for x in np.arange(0, h - size + 1, interval):
        for y in np.arange(0, w - size + 1, interval):
            tiles.append((int(x), int(y)))
        if tiles[-1][1] + size != w:
            tiles.append((int(x), w - size))
    if tiles[-1][0] + size != h:
        for y in np.arange(0, w - size + 1, interval):
            tiles.append((h - size, int(y)))
        if tiles[-1][1] + size != w:
            tiles.append((h - size, w - size))
    return tiles


def categorize_oracle(x: int) -> int:
    """(spec: reference dataset/dataset.py:745-761)"""
    if x == 0:
        return 0
    elif x <= 5:
        return 1
    elif x <= 10:
        return 2
    elif x <= 20:
        return 3
    elif x <= 50:
        return 4
    elif x <= 200:
        return 5
    return 6


def topk_select_oracle(
    probs: np.ndarray, groups: np.ndarray, labels: np.ndarray,
    tiles_per_pos: int, topk_neg: int,
) -> np.ndarray:
    """The lexsort + modular-index selection
    (spec: reference inference.py:31-43). Returns a boolean mask over tiles
    in their original order."""
    order = np.lexsort((probs, groups))
    n = len(probs)
    index = np.empty(n, dtype=bool)
    # NB: the trick indexes the *unsorted* groups array, which works because
    # tiles are emitted image-by-image so `groups` is already sorted and the
    # lexsort is stable within each group.
    for i in range(n):
        topk = topk_neg if labels[groups[i]] == 0 else labels[groups[i]] * tiles_per_pos
        index[i] = groups[i] != groups[(i + topk) % n]
    selected_sorted_positions = order[index]
    mask = np.zeros(n, dtype=bool)
    mask[selected_sorted_positions] = True
    return mask


def qwk_oracle(rater_a, rater_b, min_rating=None, max_rating=None) -> float:
    """O(K²)-loop QWK (spec: reference metrics/quadratic_weighted_kappa.py:38-85)."""
    rater_a = np.array(rater_a, dtype=int)
    rater_b = np.array(rater_b, dtype=int)
    if min_rating is None:
        min_rating = min(rater_a.min(), rater_b.min())
    if max_rating is None:
        max_rating = max(rater_a.max(), rater_b.max())
    num_ratings = int(max_rating - min_rating + 1)
    conf = np.zeros((num_ratings, num_ratings))
    for a, b in zip(rater_a, rater_b):
        conf[a - min_rating][b - min_rating] += 1
    hist_a = np.zeros(num_ratings)
    hist_b = np.zeros(num_ratings)
    for r in rater_a:
        hist_a[r - min_rating] += 1
    for r in rater_b:
        hist_b[r - min_rating] += 1
    n = float(len(rater_a))
    num = 0.0
    den = 0.0
    for i in range(num_ratings):
        for j in range(num_ratings):
            expected = hist_a[i] * hist_b[j] / n
            d = (i - j) ** 2 / (num_ratings - 1) ** 2
            num += d * conf[i][j] / n
            den += d * expected / n
    return 1.0 - num / den
