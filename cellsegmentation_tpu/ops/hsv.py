"""HSV channel separation for pseudo-mask refinement — on device.

The reference binarizes by thresholding the V channel of
``cv2.cvtColor(img, cv2.COLOR_BGR2HSV)`` at 170 and intersecting the
*inverted* result with the tile mask (reference:
utils/image_processing.py:114-124). Two behavioral facts we preserve:

1. the images fed in are RGB but converted with the BGR flag — harmless for
   V, because OpenCV's V = max(channel values) is permutation-invariant;
2. the threshold is ``cv2.THRESH_BINARY`` with thresh=170: strictly greater
   than 170 maps to foreground.

So the whole refinement reduces to ``keep = mask & (max_channel <= 170)``:
one vectorized reduction, jit-friendly, no OpenCV on the hot path.
"""

from __future__ import annotations

import jax.numpy as jnp


def rgb_value_channel(images: jnp.ndarray) -> jnp.ndarray:
    """OpenCV HSV 'V' channel of uint8 images [..., H, W, 3]: max over channels."""
    return jnp.max(images, axis=-1)


def hsv_refine_mask(
    images: jnp.ndarray, masks: jnp.ndarray, value_threshold: int = 170
) -> jnp.ndarray:
    """Intersect tile masks with the inverted V>threshold binarization.

    images: uint8 [..., H, W, 3]; masks: bool/int [..., H, W].
    Returns bool [..., H, W]. Small-region removal (a host/native morphology
    pass) is applied afterwards by the postprocess layer.
    """
    v = rgb_value_channel(images)
    bright = v > value_threshold  # cv2.THRESH_BINARY: strictly greater
    return jnp.logical_and(masks.astype(bool), jnp.logical_not(bright))
