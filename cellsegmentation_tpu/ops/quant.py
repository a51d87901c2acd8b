"""int8 quantization primitives.

These building blocks back the q8 serving engine's activation sandwiches
(ops/infer_engine.py) and pin the quantization numerics in tests/test_quant.py.
(The fully-quantized GEMM trunk they originally targeted was built, measured,
and deleted — docs/PERF.md records why: chained in-kernel int8 dots collapse
to ~28 TOPS on operand-repacking relayouts on this Mosaic toolchain.)

Symmetric quantization with the standard scale algebra:

    y = (x_q · w_q) · (s_x ⊗ s_w) + b        x_q int8, w_q int8, accum int32

Calibration is max-abs: per-output-channel for weights, per-tensor for
activations (collected from a pilot batch by ``calibrate_activation_scale``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def quantize_weights(w, axis: int = -1):
    """Symmetric per-output-channel int8 quantization.

    w: [..., Cout] float; returns (w_q int8, scale f32 [Cout]).
    """
    w = np.asarray(w, np.float32)
    reduce_axes = tuple(i for i in range(w.ndim) if i != (axis % w.ndim))
    absmax = np.abs(w).max(axis=reduce_axes)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    shape = [1] * w.ndim
    shape[axis % w.ndim] = -1
    w_q = np.clip(np.round(w / scale.reshape(shape)), -127, 127).astype(np.int8)
    return jnp.asarray(w_q), jnp.asarray(scale)


def calibrate_activation_scale(x) -> float:
    """Per-tensor max-abs activation scale from a pilot batch."""
    return float(np.abs(np.asarray(x, np.float32)).max() / 127.0) or 1.0


def quantize_activations(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    return jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(
        jnp.int8
    )


def int8_gemm(
    x_q: jnp.ndarray,  # [M, K] int8
    w_q: jnp.ndarray,  # [K, N] int8
    x_scale: float,
    w_scale: jnp.ndarray,  # [N] f32
    bias: jnp.ndarray | None = None,  # [N] f32
) -> jnp.ndarray:
    """Quantized GEMM -> dequantized f32 output."""
    acc = jax.lax.dot_general(
        x_q, w_q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * (x_scale * w_scale)
    if bias is not None:
        y = y + bias
    return y


def quantized_dense_forward(x, w, bias, x_scale: float):
    """Reference composition: quantize x on the fly, int8 GEMM, dequantize.

    Ranking-fidelity rule of thumb (validated in tests/test_quant.py): with
    max-abs calibration the int8 path keeps relative error ~1% on
    well-conditioned layers — enough for stage-2's prob *ranking* (top-k
    selection), which is the quantization target.
    """
    w_q, w_scale = quantize_weights(np.asarray(w), axis=-1)
    x_q = quantize_activations(x, x_scale)
    return int8_gemm(x_q, w_q, x_scale, w_scale, bias)
