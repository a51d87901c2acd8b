"""GEMM-formulated convolutions for tiny spatial maps.

On TPU, XLA's convolution path collapses for the tile trunk's shapes
(measured on v5e: a 3×3 conv over [28800, 8, 8, 64] runs at ~0.9 TFLOP/s
while the same math as explicit GEMMs runs ~10× faster — the 8×8 spatial
tile can't be laid out onto the MXU). ``gemm_conv2d`` lowers:

- 1×1 stride-1 convs -> one dot_general over flattened pixels;
- k×k convs with small H/W -> k² shift-sliced GEMMs accumulated in f32
  (the "shifted GEMM" trick: out[i,j] += x_pad[i·s+di, j·s+dj] @ w[di,dj]);
- everything else (large maps, grouped/depthwise) -> lax.conv unchanged.

``SmartConv`` is a drop-in nn.Conv subclass (same params/name schema, so
checkpoints and the torch converter are unaffected).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# Maps at or below this many pixels per side use the shifted-GEMM path.
_MAX_GEMM_HW = 19


def _norm_padding(padding, kh: int, kw: int):
    if isinstance(padding, str):
        if padding.upper() == "VALID":
            return (0, 0), (0, 0)
        if padding.upper() == "SAME":
            return ((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2)
        raise ValueError(padding)
    (ph0, ph1), (pw0, pw1) = padding
    return (ph0, ph1), (pw0, pw1)


def gemm_conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    strides: tuple[int, int] = (1, 1),
    padding="VALID",
    feature_group_count: int = 1,
    preferred_element_type=jnp.float32,
) -> jnp.ndarray:
    """NHWC conv via GEMMs where profitable; falls back to lax.conv."""
    kh, kw, cin_g, cout = w.shape
    n, h, wdt, cin = x.shape
    sh, sw = strides
    (ph0, ph1), (pw0, pw1) = _norm_padding(padding, kh, kw)
    out_h = (h + ph0 + ph1 - kh) // sh + 1
    out_w = (wdt + pw0 + pw1 - kw) // sw + 1

    import os

    mode = os.environ.get("CST_FASTCONV", "off")  # off | 1x1 | all
    use_gemm = (
        mode != "off"
        and feature_group_count == 1
        and max(h, wdt) <= _MAX_GEMM_HW
        and (mode == "all" or (kh == kw == 1 and (sh, sw) == (1, 1)))
    )
    if not use_gemm:
        # no preferred_element_type here: the f32-out conv's transposed-conv
        # VJP mixes f32 cotangents with bf16 weights and lax rejects it
        y = jax.lax.conv_general_dilated(
            x, w, strides, ((ph0, ph1), (pw0, pw1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=feature_group_count,
        )
        return y.astype(x.dtype)

    if kh == kw == 1 and (sh, sw) == (1, 1) and (ph0, ph1, pw0, pw1) == (0, 0, 0, 0):
        y = jax.lax.dot_general(
            x.reshape(-1, cin), w[0, 0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=preferred_element_type,
        )
        return y.reshape(n, h, wdt, cout).astype(x.dtype)

    xp = jnp.pad(x, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)))
    acc = jnp.zeros((n, out_h, out_w, cout), preferred_element_type)
    for di in range(kh):
        for dj in range(kw):
            window = xp[
                :,
                di : di + (out_h - 1) * sh + 1 : sh,
                dj : dj + (out_w - 1) * sw + 1 : sw,
                :,
            ]
            acc = acc + jax.lax.dot_general(
                window, w[di, dj],
                (((3,), (0,)), ((), ())),
                preferred_element_type=preferred_element_type,
            )
    return acc.astype(x.dtype)


class SmartConv(nn.Conv):
    """nn.Conv with the (opt-in, CST_FASTCONV=1x1|all) GEMM lowering;
    identical params/naming. Measured on v5e: XLA's in-graph conv fusions
    already match the lowering, so it stays off by default — the standalone
    speedup (10×) only shows up for un-fused single convs; the folded
    inference engine covers the production path instead."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import os

        if (
            os.environ.get("CST_FASTCONV", "off") == "off"
            or self.feature_group_count != 1
            or x.ndim != 4
            or max(x.shape[1], x.shape[2]) > _MAX_GEMM_HW
            or self.use_bias
        ):
            return super().__call__(x)
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (kh, kw, x.shape[-1] // self.feature_group_count, self.features),
            self.param_dtype,
        )
        strides = self.strides if isinstance(self.strides, tuple) else (self.strides, self.strides)
        return gemm_conv2d(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            strides=tuple(strides),
            padding=self.padding,
            preferred_element_type=jnp.float32,
        )
