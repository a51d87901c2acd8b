"""Bilinear resize with align_corners=True semantics.

The reference decoder upsamples with ``F.interpolate(..., mode="bilinear",
align_corners=True)`` (reference: model/resnet.py:282-300). ``jax.image.resize``
implements half-pixel-center sampling only, so we build the align-corners
variant from two separable gathers with static indices/weights — cheap,
fusable, and differentiable.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _lerp_coeffs(in_size: int, out_size: int):
    """Static (low_idx, high_idx, high_weight) for align-corners sampling."""
    if out_size == 1 or in_size == 1:
        coords = np.zeros(out_size)
    else:
        coords = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    low = np.floor(coords).astype(np.int32)
    low = np.clip(low, 0, in_size - 1)
    high = np.minimum(low + 1, in_size - 1)
    w = (coords - low).astype(np.float32)
    return low, high, w


def _resize_axis(x: jnp.ndarray, axis: int, out_size: int) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    low, high, w = _lerp_coeffs(in_size, out_size)
    lo = jnp.take(x, jnp.asarray(low), axis=axis)
    hi = jnp.take(x, jnp.asarray(high), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = jnp.asarray(w, dtype=x.dtype).reshape(shape)
    return lo * (1 - w) + hi * w


def resize_bilinear_align_corners(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Resize NHWC (or HWC) images to (out_h, out_w), align_corners=True."""
    h_axis = x.ndim - 3
    w_axis = x.ndim - 2
    x = _resize_axis(x, h_axis, out_h)
    x = _resize_axis(x, w_axis, out_w)
    return x
