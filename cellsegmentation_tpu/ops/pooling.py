"""Pooling helpers.

Every head in the reference feeds on ``AdaptiveAvgPool2d(1) +
AdaptiveMaxPool2d(1)`` (reference: model/resnet.py:121-131, 266, 274). For a
1×1 target that is just mean+max reductions over the spatial axes — fused
here into one traversal-friendly expression XLA keeps in registers.
"""

from __future__ import annotations

import jax.numpy as jnp


def global_avg_max_pool(x: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, C] -> [..., C]: global average pool + global max pool, summed."""
    spatial_axes = (x.ndim - 3, x.ndim - 2)
    return jnp.mean(x, axis=spatial_axes) + jnp.max(x, axis=spatial_axes)
