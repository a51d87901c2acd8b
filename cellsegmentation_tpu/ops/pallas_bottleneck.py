"""Pallas TPU kernel: VMEM-resident chain of ResNet bottleneck blocks.

Why: at tile scale (8×8 / 4×4 spatial maps, 28k-tile batches) every
bottleneck block costs a full HBM round trip of its activations — XLA fuses
*within* a block but writes the [N, H, W, 256] tensor between blocks
(~1 GB each for layer1; measured 3.6 ms/block on v5e). The per-tile
activation footprint is tiny (8·8·256·bf16 = 32 KB), so a whole *stage* fits
in VMEM: this kernel streams a chunk of tiles in, runs every block's three
convolutions as MXU dots, and writes only the stage output.

v2 kernel structure (v1's im2col scratch copies dominated its runtime):
- the 3×3 conv is 9 shift-sliced GEMMs accumulated in f32 — reads come
  straight from a zero-padded VMEM scratch, no column-matrix assembly;
- the 1×1 expand conv + residual are computed in N-halves so the transient
  f32 stack stays small;
- block outputs stage through a VMEM scratch ref, so only the final block
  touches HBM.

Scope: stride-1 chains with optional per-block projection shortcuts —
exactly ResNet layer1 and the tails of layers 2-4. All BN is pre-folded into
conv weights+biases (inference only; see infer_engine.fold_conv_bn).

Weights layout per block b (all bf16, biases f32):
    w1 [Cin_b, Cmid]   b1 [Cmid]      (1×1 reduce)
    w2 [3, 3, Cmid, Cmid] b2 [Cmid]   (3×3, pad 1, stride 1)
    w3 [Cmid, Cout]    b3 [Cout]      (1×1 expand)
    [wd [Cin_b, Cout]  bd [Cout]]     (projection shortcut, block 0 only)
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _block_body(x, weights, has_proj, h, w, bt, padded_scr, out_scr):
    """One bottleneck block on a VMEM-resident value x [bt, h, w, cin];
    result is written into (and re-read from) out_scr."""
    if has_proj:
        w1, b1, w2, b2, w3, b3, wd, bd = weights
    else:
        w1, b1, w2, b2, w3, b3 = weights
    cin = x.shape[-1]
    cmid = w1.shape[-1]
    cout = w3.shape[-1]

    flat = x.reshape(bt * h * w, cin)
    hid = jnp.maximum(_dot(flat, w1) + b1, 0.0).astype(jnp.bfloat16)

    # zero-padded copy of hid for the shifted reads
    padded_scr[:, :, :, :cmid] = jnp.zeros((bt, h + 2, w + 2, cmid), jnp.bfloat16)
    padded_scr[:, 1 : h + 1, 1 : w + 1, :cmid] = hid.reshape(bt, h, w, cmid)

    acc = jnp.zeros((bt * h * w, cmid), jnp.float32)
    for di in range(3):
        for dj in range(3):
            window = padded_scr[:, di : di + h, dj : dj + w, :cmid]
            acc = acc + _dot(window.reshape(bt * h * w, cmid), w2[di, dj])
    hid2 = jnp.maximum(acc + b2, 0.0).astype(jnp.bfloat16)

    # expand conv + residual in N-halves: transient f32 stays [M, cout/2]
    half = cout // 2
    for lo, hi in ((0, half), (half, cout)):
        out = _dot(hid2, w3[:, lo:hi]) + b3[lo:hi]
        if has_proj:
            res = _dot(flat, wd[:, lo:hi]) + bd[lo:hi]
        else:
            res = flat[:, lo:hi].astype(jnp.float32)
        y = jnp.maximum(out + res, 0.0).astype(jnp.bfloat16)
        out_scr[:, :, :, lo:hi] = y.reshape(bt, h, w, hi - lo)

    return out_scr[:, :, :, :cout]


def fused_bottleneck_chain(
    x: jnp.ndarray,
    block_weights: Sequence[Sequence[jnp.ndarray]],
    block_tiles: int = 64,
) -> jnp.ndarray:
    """Run a stride-1 bottleneck chain entirely in VMEM.

    x: [N, H, W, Cin] bf16 (N divisible by block_tiles);
    block_weights: per block, the 6/8 arrays described above.
    Returns [N, H, W, Cout] bf16.
    """
    n, h, w, cin = x.shape
    assert n % block_tiles == 0, (n, block_tiles)
    has_proj = [len(bw) == 8 for bw in block_weights]
    cout = block_weights[-1][4].shape[-1]
    cout_max = max(bw[4].shape[-1] for bw in block_weights)
    cmid_max = max(bw[0].shape[-1] for bw in block_weights)
    flat_weights = [arr for bw in block_weights for arr in bw]

    def kernel(x_ref, *refs):
        out_ref, padded_scr, out_scr = refs[-3], refs[-2], refs[-1]
        w_refs = refs[:-3]
        val = x_ref[:]
        idx = 0
        for bi, bw in enumerate(block_weights):
            nw = len(bw)
            weights = [w_refs[idx + k][:] for k in range(nw)]
            idx += nw
            val = _block_body(
                val, weights, has_proj[bi], h, w, block_tiles,
                padded_scr, out_scr,
            )
        out_ref[:] = val

    grid = (n // block_tiles,)
    in_specs = [
        pl.BlockSpec(
            (block_tiles, h, w, cin),
            lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    ] + [
        pl.BlockSpec(
            arr.shape, lambda i, nd=arr.ndim: (0,) * nd, memory_space=pltpu.VMEM
        )
        for arr in flat_weights
    ]
    out_spec = pl.BlockSpec(
        (block_tiles, h, w, cout), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    flops = 0
    for bw, hp in zip(block_weights, has_proj):
        w1, _, w2, _, w3, _ = bw[:6]
        per_px = (
            w1.shape[0] * w1.shape[1]
            + 9 * w2.shape[2] * w2.shape[3]
            + w3.shape[0] * w3.shape[1]
            + (bw[6].shape[0] * bw[6].shape[1] if hp else 0)
        )
        flops += 2 * n * h * w * per_px

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((block_tiles, h + 2, w + 2, cmid_max), jnp.bfloat16),
            pltpu.VMEM((block_tiles, h, w, cout_max), jnp.bfloat16),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * 2 + n * h * w * cout * 2,
            transcendentals=0,
        ),
    )(x, *flat_weights)
