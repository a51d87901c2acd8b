"""Adaptive, count-driven top-k tile selection — the structural core of stage 2.

The reference sorts all tiles of all images with ``np.lexsort((probs, groups))``
and marks the top ``label*tiles_per_pos`` (positive images) or ``topk_neg``
(negative images) tiles per image with a modular index trick
(reference: inference.py:31-43). Under XLA we cannot lexsort a ragged,
data-dependent k — but the grid is dense [B, T], so per-image selection
becomes a *stable rank mask*:

    selected[b, t]  ⇔  ascending-stable-rank(probs[b])[t] >= T - k_b

which selects exactly the k_b highest-prob tiles, breaking ties towards
higher tile indices — the same tie behavior as the reference's stable
lexsort + take-from-the-top-of-the-ascending-order trick. With ≥2 images the
modular wrap-around resolves to plain top-k (oracle-verified in
tests/test_ops.py); the reference's 1-image degenerate case (the wrap never
leaves the group, so nothing is selected) is intentionally NOT replicated.
"""

from __future__ import annotations

import jax.numpy as jnp


def _ascending_stable_rank(probs: jnp.ndarray) -> jnp.ndarray:
    """rank[t] = position of tile t in a stable ascending sort of its row."""
    order = jnp.argsort(probs, axis=-1, stable=True)
    ranks = jnp.zeros_like(order)
    put = jnp.broadcast_to(
        jnp.arange(probs.shape[-1], dtype=order.dtype), probs.shape
    )
    return jnp.put_along_axis(ranks, order, put, axis=-1, inplace=False)


def adaptive_topk_mask(
    probs: jnp.ndarray,
    labels: jnp.ndarray,
    tiles_per_pos: int,
    topk_neg: int,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Boolean [B, T] mask of the selected tiles.

    probs:  [B, T] P(positive) per tile.
    labels: [B] integer cell counts; k = count*tiles_per_pos if count>0 else topk_neg.
    valid:  optional [B, T] mask for padded tiles (padded entries never selected).
    """
    T = probs.shape[-1]
    if valid is not None:
        # Push padding to the bottom of the ascending order.
        probs = jnp.where(valid, probs, -jnp.inf)
    k = jnp.where(labels > 0, labels * tiles_per_pos, topk_neg)
    k = jnp.clip(k, 0, T)[..., None]  # [B, 1]
    ranks = _ascending_stable_rank(probs)
    mask = ranks >= (T - k)
    if valid is not None:
        mask = jnp.logical_and(mask, valid)
    return mask


def topk_threshold_mask(probs: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Tiles above a probability threshold (stage-3 pseudo-mask ranking,
    reference: train_seg.py:234-249 filters lexsorted tiles at prob > 0.95)."""
    return probs > threshold
