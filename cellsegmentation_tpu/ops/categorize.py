"""LYSTO 7-bin count <-> class mapping (reference: dataset/dataset.py:745-780).

Bins: 0 | 1-5 | 6-10 | 11-20 | 21-50 | 51-200 | >200. Implemented as a
vectorized digitize on device plus scalar/numpy twins for host code.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

NUM_CLASSES = 7
_BOUNDARIES = np.asarray([1, 6, 11, 21, 51, 201])
CLASS_MIN_COUNT = np.asarray([0, 1, 6, 11, 21, 51, 201], dtype=np.int32)
CLASS_MAX_COUNT = np.asarray([0, 5, 10, 20, 50, 200, 100000], dtype=np.int32)


def categorize(x: jnp.ndarray) -> jnp.ndarray:
    """Count -> class id, vectorized on device."""
    return jnp.digitize(x, jnp.asarray(_BOUNDARIES))


def de_categorize(label: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Class id -> (min count, max count), vectorized on device."""
    label = label.astype(jnp.int32)
    return (
        jnp.asarray(CLASS_MIN_COUNT)[label],
        jnp.asarray(CLASS_MAX_COUNT)[label],
    )


def categorize_np(x) -> np.ndarray:
    return np.digitize(x, _BOUNDARIES)


def de_categorize_np(label) -> tuple[np.ndarray, np.ndarray]:
    label = np.asarray(label, dtype=np.int64)
    return CLASS_MIN_COUNT[label], CLASS_MAX_COUNT[label]
