"""Losses: cross-entropy, (weighted) MSE, soft dice.

Behavioral spec from the reference:
- MSELoss — plain squared error (reference: train/losses.py:5-14);
- WeightedMSELoss — per-element weight is ``ln(count)`` for counts ≥ 20 and,
  quirkily, the raw count value otherwise (``weights = targets.clone()`` is
  only overwritten where ≥ 20; reference: metrics/metrics.py:23-33). Replicated
  verbatim because it changes training dynamics;
- DiceLoss — soft dice with eps 1e-6, flat (2-D) and per-row (batch) variants
  (reference: metrics/metrics.py:36-53, train/losses.py:44-62).

All reductions happen in f32 regardless of input dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean softmax cross-entropy with integer labels (torch CELoss parity)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)
    return jnp.mean(nll)


def mse(inputs: jnp.ndarray, targets: jnp.ndarray, reduction: str = "mean") -> jnp.ndarray:
    sq = (inputs.astype(jnp.float32) - targets.astype(jnp.float32)) ** 2
    return jnp.mean(sq) if reduction == "mean" else jnp.sum(sq)


def weighted_mse(
    inputs: jnp.ndarray, targets: jnp.ndarray, reduction: str = "mean"
) -> jnp.ndarray:
    """MSE weighted by ln(count) for counts ≥ 20, by the raw count otherwise.

    The "raw count otherwise" branch is a reference quirk kept for parity
    (reference: metrics/metrics.py:27-31: weights start as a copy of the
    targets and only entries ≥ 20 are replaced by their log).
    """
    t = targets.astype(jnp.float32)
    weights = jnp.where(t >= 20, jnp.log(jnp.maximum(t, 1e-12)), t)
    sq = weights * (inputs.astype(jnp.float32) - t) ** 2
    return jnp.mean(sq) if reduction == "mean" else jnp.sum(sq)


def dice_coef(inputs: jnp.ndarray, targets: jnp.ndarray, epsilon: float = 1e-6) -> jnp.ndarray:
    """Soft dice. 2-D inputs -> scalar over the flattened mask; N-D inputs ->
    one coefficient per leading-batch row (reference: metrics/metrics.py:36-53)."""
    inputs = inputs.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    if inputs.ndim == 2:
        a = jnp.sum(inputs * targets)
        b = jnp.sum(inputs * inputs)
        c = jnp.sum(targets * targets)
    else:
        flat_in = inputs.reshape(inputs.shape[0], -1)
        flat_tg = targets.reshape(targets.shape[0], -1)
        a = jnp.sum(flat_in * flat_tg, axis=1)
        b = jnp.sum(flat_in * flat_in, axis=1)
        c = jnp.sum(flat_tg * flat_tg, axis=1)
    return (2 * a + epsilon) / (b + c + epsilon)


def dice_loss(
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    epsilon: float = 1e-6,
    reduction: str = "mean",
) -> jnp.ndarray:
    d = 1 - dice_coef(inputs, targets, epsilon)
    return jnp.mean(d) if reduction == "mean" else jnp.sum(d)
