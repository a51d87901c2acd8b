"""Single-dot Pallas int8 GEMM with fused dequant/bias/residual/requant
epilogue — the compute primitive of the stage-2 serving trunk.

Round-2 established (docs/PERF.md) that multi-conv chains fused inside one
Mosaic kernel are a dead end end-to-end, and round-3 re-measurement (after
removing a ~30 ms per-call fetch floor that contaminated every round-2
microbench) showed that a *single* int8 GEMM per Pallas call runs at the
roofline: ~390-420 TOPS on compute-bound trunk shapes, and at the int8
bandwidth cap (~170 TOPS, still 2x the bf16 rate) on the small-K shapes.
So the trunk's convs each become ONE Pallas int8 GEMM with XLA glue
between kernels; 3x3 convs on tiny tile spatial maps become whole-tile
GEMMs (see ops/q8_trunk.py).

Epilogue (fused into the final K-step, so activations cross HBM as int8):

    y = acc_i32 * (in_scale * w_scale[col]) + bias[col]   # dequant + bias
    y += residual_i8 * res_scale                          # optional skip
    y = relu(y)                                           # optional
    out = int8 round(y / out_scale)  |  bf16 y            # requant | final

Per-OUTPUT-CHANNEL weight scales ride a [1, N] f32 input; per-tensor
activation scales are Python floats baked at trace time (they come from
checkpoint calibration and are constant for a whole stage-2 cycle — the
encoder is frozen, reference: model/resnet.py:315-319).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Scoped-VMEM budget for block picking. Mosaic's DEFAULT scoped limit is
# ~16 MB, but the physical VMEM is far larger; raising the budget and
# passing the matching vmem_limit_bytes lets bigger bm blocks enter the
# ladder, amortizing weight-plane re-streaming across the revolving
# K/tap grid. Hardware A/B at the bench geometry (bracketed by two
# baseline runs, round 4): 12 MB -> 4,156 img/s, 24 -> 4,204, 48 ->
# 4,233 (+1.9%, SERVING DEFAULT), 96 -> 4,151 (past the sweet spot the
# jumbo blocks starve double-buffering). CST_VMEM_MB overrides
# (CST_VMEM_MB=12 restores the conservative pre-round-4 model: naive
# budget under the default scoped limit, no compiler param, no jumbo
# blocks). The compiler's scoped accounting runs up to ~35% over this
# naive block model (see the rowtap derate note below) — the passed
# vmem_limit_bytes carries that headroom.
# 48 MB was validated on a 128 MB-VMEM v5p-class chip; smaller-VMEM
# generations should export CST_VMEM_MB=12 (the conservative model —
# no compiler param, no jumbo blocks). A malformed env value falls back
# to the default rather than failing at import.
try:
    _VMEM_MB = int(os.environ.get("CST_VMEM_MB", "48") or 0)
except ValueError:
    _VMEM_MB = 48
_VMEM_BUDGET = (_VMEM_MB if _VMEM_MB else 12) * 1024 * 1024
_COMPILER_PARAMS = (
    pltpu.CompilerParams(
        vmem_limit_bytes=_VMEM_BUDGET + _VMEM_BUDGET // 3
    )
    if _VMEM_MB > 12
    else None
)
# /960-aligned jumbo blocks only enter the ladder when the budget was
# raised: first-fit picking would otherwise change serving block shapes
# under the default budget without hardware validation.
_BM_XL = (5760, 3840, 2880, 1920) if _VMEM_MB > 12 else ()
# Jumbo output-column blocks for q8_matmul (the whole-tile 3x3 GEMMs,
# N = px*c_out up to 2048): bn=N keeps the x block from re-streaming per
# column block. Experimental gate — measured via CST_BN_XL=1.
_BN_XL = (
    (2048, 1024) if _VMEM_MB > 12 and os.environ.get("CST_BN_XL") else ()
)


def _pick_block(dim: int, candidates, fits=None) -> int:
    for c in candidates:
        if dim % c == 0 and (fits is None or fits(c)):
            return c
    return dim


def _mm_kernel(*refs, out_spec, has_res):
    """One (BM, BN) output block; grid dim 2 walks K accumulating in VMEM."""
    if has_res:
        x_ref, w_ref, b_ref, ws_ref, r_ref, o_ref, acc_ref = refs
    else:
        x_ref, w_ref, b_ref, ws_ref, o_ref, acc_ref = refs
        r_ref = None

    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        kind, in_scale, res_scale, out_scale, relu = out_spec
        y = acc_ref[:].astype(jnp.float32) * (in_scale * ws_ref[:])
        y = y + b_ref[:]
        if r_ref is not None:
            y = y + r_ref[:].astype(jnp.float32) * res_scale
        if relu:
            y = jnp.maximum(y, 0.0)
        if kind == "int8":
            o_ref[:] = jnp.clip(
                jnp.round(y * (1.0 / out_scale)), -127, 127
            ).astype(jnp.int8)
        elif kind == "bf16":
            o_ref[:] = y.astype(jnp.bfloat16)
        else:  # int32 raw accumulator (microbench)
            o_ref[:] = acc_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("out_kind", "in_scale", "res_scale", "out_scale",
                     "relu", "bm", "bn", "bk", "interpret"),
)
def q8_matmul(
    x: jnp.ndarray,  # [M, K] int8
    w: jnp.ndarray,  # [K, N] int8
    bias: jnp.ndarray,  # [N] f32 (already BN-folded)
    w_scale: jnp.ndarray,  # [N] f32 per-output-channel weight scales
    residual: jnp.ndarray | None = None,  # [M, N] int8, added pre-relu
    out_kind: str = "int8",  # "int8" | "bf16" | "int32"
    in_scale: float = 1.0,
    res_scale: float = 1.0,
    out_scale: float = 1.0,
    relu: bool = True,
    bm: int = 0,
    bn: int = 0,
    bk: int = 0,
    interpret: bool = False,
):
    """requant(relu(x_i8 @ w_i8 * scales + bias [+ residual])) in one call.

    M must divide by the chosen bm (a multiple of 32; 960 divides every
    trunk M including 43200-tile steps), K and N by 128.
    """
    m, k = x.shape
    _, n = w.shape
    bn = bn or _pick_block(n, _BN_XL + (512, 256, 128))
    bk = bk or _pick_block(k, (2048, 1024, 512, 384, 256, 128))

    def fits(c):  # double-buffered blocks + int32 accumulator
        out_b = 4 if out_kind == "int32" else (2 if out_kind == "bf16" else 1)
        res_b = c * bn if residual is not None else 0
        return (
            2 * (c * bk + bk * bn + c * bn * out_b + res_b) + 4 * c * bn
            <= _VMEM_BUDGET
        )

    bm = bm or _pick_block(m, _BM_XL + (1024, 960, 512, 256, 128, 64, 32), fits)
    grid = (m // bm, n // bn, k // bk)
    out_dtype = {"int8": jnp.int8, "bf16": jnp.bfloat16, "int32": jnp.int32}[
        out_kind
    ]
    has_res = residual is not None
    kernel = functools.partial(
        _mm_kernel,
        out_spec=(out_kind, in_scale, res_scale, out_scale, relu),
        has_res=has_res,
    )
    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, w, bias.reshape(1, n), w_scale.reshape(1, n)]
    if has_res:
        in_specs.append(
            pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                         memory_space=pltpu.VMEM)
        )
        args.append(residual)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k + k * n + m * n,
            transcendentals=0,
        ),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(*args)


# ---------------------------------------------------------------------------
# Tap-accumulating 3x3 conv in whole-tile layout
# ---------------------------------------------------------------------------


def _tap_kernel(x_ref, w_ref, b_ref, ws_ref, o_ref, acc_ref, *, out_spec,
                geom):
    """One (bm, C') output block of one output pixel group; grid dim 2
    walks the 9 taps accumulating single dots in VMEM (the same
    single-dot-per-kernel discipline as _mm_kernel's K-grid — chained
    dots inside one Mosaic kernel relayout-collapse, docs/PERF.md)."""
    h_in, w_in, w_out, stride = geom
    p = pl.program_id(1)
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    hi = stride * (p // w_out) + t // 3 - 1
    wi = stride * (p % w_out) + t % 3 - 1
    valid = (hi >= 0) & (hi < h_in) & (wi >= 0) & (wi < w_in)

    @pl.when(valid)
    def _():
        acc_ref[:] += jax.lax.dot_general(
            x_ref[:], w_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    @pl.when(t == pl.num_programs(2) - 1)
    def _():
        kind, in_scale, out_scale, relu = out_spec
        y = acc_ref[:].astype(jnp.float32) * (in_scale * ws_ref[:])
        y = y + b_ref[:]
        if relu:
            y = jnp.maximum(y, 0.0)
        if kind == "int8":
            o_ref[:] = jnp.clip(
                jnp.round(y * (1.0 / out_scale)), -127, 127
            ).astype(jnp.int8)
        else:
            o_ref[:] = y.astype(jnp.bfloat16)


@functools.partial(
    jax.jit,
    static_argnames=("h_in", "w_in", "stride", "c_in", "out_kind",
                     "in_scale", "out_scale", "relu", "bm", "interpret"),
)
def q8_conv3_tap(
    x: jnp.ndarray,  # [M, h_in*w_in*c_in] int8, whole-tile layout
    w: jnp.ndarray,  # [9*c_in, c_out] int8, tap-major rows (dy*3+dx)
    bias: jnp.ndarray,  # [c_out] f32 (BN-folded)
    w_scale: jnp.ndarray,  # [c_out] f32 per-output-channel scales
    h_in: int = 0,
    w_in: int = 0,
    stride: int = 1,
    c_in: int = 0,
    out_kind: str = "int8",
    in_scale: float = 1.0,
    out_scale: float = 1.0,
    relu: bool = True,
    bm: int = 0,
    interpret: bool = False,
):
    """3x3 pad-1 conv on whole-tile maps as 9 shifted single-dot GEMMs.

    out[n, (ho,wo), co] = sum_taps x[n, (s*ho+dy-1, s*wo+dx-1), ci]
    * K[dy,dx,ci,co], out-of-range taps skipped — the ZERO-redundancy
    formulation of the tile-map 3x3 (the whole-tile Toeplitz GEMM of
    ops/q8_trunk.py re-multiplies px_in/9 redundant K-columns per output
    pixel: 7.1x at 8x8 px). Grid = (M blocks, output pixel groups, 9 taps);
    each step is one [bm, C] x [C, C'] int8 dot accumulated in a VMEM
    scratch, with out-of-range taps masked by a scalar predicate on the
    grid indices (their block fetch is clamped in-range and discarded).

    Accumulates the EXACT same int32 products as the whole-tile GEMM
    (identical per-channel weight quantization; the Toeplitz zeros
    contribute nothing), so the two paths are bit-identical.

    Reference behavior spec: the stride-s 3x3 of the frozen Bottleneck
    tile forward (reference: model/resnet.py:236-243, inference.py:9-28).
    """
    m = x.shape[0]
    assert h_in and w_in and c_in, "static geometry is required"
    h_out = (h_in - 1) // stride + 1
    w_out = (w_in - 1) // stride + 1
    px_out = h_out * w_out
    c_out = w.shape[1]

    def fits(c):  # double-buffered x/out blocks + i32 accumulator
        out_b = 2 if out_kind == "bf16" else 1
        return (
            2 * (c * c_in + c * c_out * out_b) + 9 * c_in * c_out
            + 4 * c * c_out
            <= _VMEM_BUDGET
        )

    bm = bm or _pick_block(m, _BM_XL + (2880, 1024, 960, 512, 256, 128, 64, 32), fits)

    def x_idx(i, p, t):
        hi = jnp.clip(stride * (p // w_out) + t // 3 - 1, 0, h_in - 1)
        wi = jnp.clip(stride * (p % w_out) + t % 3 - 1, 0, w_in - 1)
        return (i, hi * w_in + wi)

    kernel = functools.partial(
        _tap_kernel,
        out_spec=(out_kind, in_scale, out_scale, relu),
        geom=(h_in, w_in, w_out, stride),
    )
    out_dtype = jnp.int8 if out_kind == "int8" else jnp.bfloat16
    # useful MACs only (out-of-range taps are skipped, ~16-31% of 9)
    valid_taps = sum(
        1
        for ho in range(h_out) for wo in range(w_out)
        for dy in range(3) for dx in range(3)
        if 0 <= stride * ho + dy - 1 < h_in
        and 0 <= stride * wo + dx - 1 < w_in
    )
    return pl.pallas_call(
        kernel,
        grid=(m // bm, px_out, 9),
        in_specs=[
            pl.BlockSpec((bm, c_in), x_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, c_out), lambda i, p, t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda i, p, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda i, p, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, c_out), lambda i, p, t: (i, p),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, px_out * c_out), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, c_out), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * valid_taps * c_in * c_out,
            bytes_accessed=m * (px_out * 9 * c_in + px_out * c_out)
            + 9 * c_in * c_out,
            transcendentals=0,
        ),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(x, w, bias.reshape(1, c_out), w_scale.reshape(1, c_out))


# ---------------------------------------------------------------------------
# Row-Toeplitz 3x3 conv in whole-tile layout
# ---------------------------------------------------------------------------


def _rowtap_kernel(x_ref, w_ref, b_ref, ws_ref, o_ref, acc_ref, *, out_spec,
                   geom):
    """One (bm, w_out*C') block = one whole OUTPUT ROW of one M block; grid
    dim 2 walks the 3 dy taps, each a single [bm, w_in*C] x [w_in*C,
    w_out*C'] dot against the dy-th row-Toeplitz weight plane (all dx taps
    of one input row at once). Same accumulate-in-VMEM discipline as
    _mm_kernel/_tap_kernel."""
    h_in, stride = geom
    ho = pl.program_id(1)
    dy = pl.program_id(2)

    @pl.when(dy == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    hi = stride * ho + dy - 1
    valid = (hi >= 0) & (hi < h_in)

    @pl.when(valid)
    def _():
        acc_ref[:] += jax.lax.dot_general(
            x_ref[:], w_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    @pl.when(dy == pl.num_programs(2) - 1)
    def _():
        kind, in_scale, out_scale, relu = out_spec
        y = acc_ref[:].astype(jnp.float32) * (in_scale * ws_ref[:])
        y = y + b_ref[:]
        if relu:
            y = jnp.maximum(y, 0.0)
        if kind == "int8":
            o_ref[:] = jnp.clip(
                jnp.round(y * (1.0 / out_scale)), -127, 127
            ).astype(jnp.int8)
        else:
            o_ref[:] = y.astype(jnp.bfloat16)


@functools.partial(
    jax.jit,
    static_argnames=("h_in", "w_in", "stride", "c_in", "out_kind",
                     "in_scale", "out_scale", "relu", "bm", "interpret"),
)
def q8_conv3_rowtap(
    x: jnp.ndarray,  # [M, h_in*w_in*c_in] int8, whole-tile layout
    w: jnp.ndarray,  # [3*w_in*c_in, w_out*c_out] int8, dy-major row-Toeplitz
    bias: jnp.ndarray,  # [w_out*c_out] f32 (per-co bias tiled over wo)
    w_scale: jnp.ndarray,  # [w_out*c_out] f32 (per-co scales tiled over wo)
    h_in: int = 0,
    w_in: int = 0,
    stride: int = 1,
    c_in: int = 0,
    out_kind: str = "int8",
    in_scale: float = 1.0,
    out_scale: float = 1.0,
    relu: bool = True,
    bm: int = 0,
    interpret: bool = False,
):
    """3x3 pad-1 conv as 3 row-Toeplitz single dots per output row.

    The middle ground between the whole-tile Toeplitz GEMM (ONE huge dot,
    px_in/9-redundant K columns — 2.6x at 4x4 maps) and the per-tap conv
    (zero redundancy but 9*px_out tiny K=C dots): dy-th dot per output row
    reads one whole INPUT row [bm, w_in*C] (contiguous in the whole-tile
    layout) against a [w_in*C, w_out*C'] weight whose (wi, wo) band holds
    K[dy, wi-stride*wo+1] (zero outside the 3-wide band — w_in/3-redundant
    only along the row axis). 3*h_out medium dots, K = w_in*C.

    Accumulates the exact same int32 products as the other two
    formulations (identical per-channel quantization; band zeros contribute
    nothing) — bit-identical outputs, pure perf knob
    (tests/test_q8_trunk.py).

    Reference behavior spec: the stride-s 3x3 of the frozen Bottleneck
    tile forward (reference: model/resnet.py:236-243, inference.py:9-28).
    """
    m = x.shape[0]
    assert h_in and w_in and c_in, "static geometry is required"
    h_out = (h_in - 1) // stride + 1
    w_out = (w_in - 1) // stride + 1
    k_row = w_in * c_in
    n_cols = w.shape[1]  # w_out * c_out
    assert n_cols % w_out == 0

    def fits(c):  # double-buffered x/out blocks + i32 accumulator
        out_b = 2 if out_kind == "bf16" else 1
        # the accumulator is counted twice: the compiler's scoped-vmem
        # accounting for this 3-dim revolving grid runs ~35% above the
        # naive single-buffered model (measured: bm=2880 at k_row=512
        # scoped 16.82M vs 12.3M modeled), and the extra acc copy is the
        # closest structural explanation — stay conservative.
        return (
            2 * (c * k_row + k_row * n_cols + c * n_cols * out_b)
            + 8 * c * n_cols
            <= _VMEM_BUDGET
        )

    bm = bm or _pick_block(m, _BM_XL + (2880, 1024, 960, 512, 256, 128, 64, 32), fits)

    def x_idx(i, ho, dy):
        return (i, jnp.clip(stride * ho + dy - 1, 0, h_in - 1))

    kernel = functools.partial(
        _rowtap_kernel,
        out_spec=(out_kind, in_scale, out_scale, relu),
        geom=(h_in, stride),
    )
    out_dtype = jnp.int8 if out_kind == "int8" else jnp.bfloat16
    valid_rows = sum(
        1
        for ho in range(h_out) for dy in range(3)
        if 0 <= stride * ho + dy - 1 < h_in
    )
    return pl.pallas_call(
        kernel,
        grid=(m // bm, h_out, 3),
        in_specs=[
            pl.BlockSpec((bm, k_row), x_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((k_row, n_cols), lambda i, ho, dy: (dy, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_cols), lambda i, ho, dy: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_cols), lambda i, ho, dy: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, n_cols), lambda i, ho, dy: (i, ho),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, h_out * n_cols), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, n_cols), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * valid_rows * k_row * n_cols,
            bytes_accessed=m * (valid_rows * k_row + h_out * n_cols)
            + 3 * k_row * n_cols,
            transcendentals=0,
        ),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(x, w, bias.reshape(1, n_cols), w_scale.reshape(1, n_cols))


# ---------------------------------------------------------------------------
# Batched (per-pixel-group) GEMM in whole-tile layout
# ---------------------------------------------------------------------------


def _bmm_kernel(*refs, out_spec, has_res):
    """One (bm, N') block of one pixel group; single dot, full epilogue."""
    if has_res:
        x_ref, w_ref, b_ref, ws_ref, r_ref, o_ref = refs
    else:
        x_ref, w_ref, b_ref, ws_ref, o_ref = refs
        r_ref = None
    kind, in_scale, res_scale, out_scale, relu = out_spec
    acc = jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (in_scale * ws_ref[:])
    y = y + b_ref[:]
    if r_ref is not None:
        y = y + r_ref[:].astype(jnp.float32) * res_scale
    if relu:
        y = jnp.maximum(y, 0.0)
    if kind == "int8":
        o_ref[:] = jnp.clip(
            jnp.round(y * (1.0 / out_scale)), -127, 127
        ).astype(jnp.int8)
    else:
        o_ref[:] = y.astype(jnp.bfloat16)


@functools.partial(
    jax.jit,
    static_argnames=("px", "c_in", "px_map", "out_kind", "in_scale",
                     "res_scale", "out_scale", "relu", "bm", "interpret"),
)
def q8_matmul_px(
    x: jnp.ndarray,  # [M, px_x * c_in] int8, whole-tile layout
    w: jnp.ndarray,  # [c_in, N'] int8, shared across pixel groups
    bias: jnp.ndarray,  # [N'] f32
    w_scale: jnp.ndarray,  # [N'] f32
    residual: jnp.ndarray | None = None,  # [M, px * N'] int8
    px: int = 1,  # number of OUTPUT pixel groups
    c_in: int = 0,
    px_map: tuple | None = None,  # (stride, w_in, w_out): strided projection
    out_kind: str = "int8",
    in_scale: float = 1.0,
    res_scale: float = 1.0,
    out_scale: float = 1.0,
    relu: bool = True,
    bm: int = 0,
    interpret: bool = False,
):
    """Per-pixel 1x1 conv as a batched GEMM over the whole-tile layout.

    Every activation stays [M, px*C] row-major — the px axis is a grid
    dimension whose index maps pick column blocks, so NO reshape or
    relayout ever materializes (TPU tiled layouts make [M*px, C] <->
    [M, px*C] reshapes real copies; this kernel exists to avoid them).
    ``px_map=(stride, w_in, w_out)`` implements strided projections (b1
    downsample): output group p=(ho,wo) reads input group
    stride*(p // w_out)*w_in + stride*(p % w_out) — pure index
    arithmetic, Mosaic-safe.
    """
    m = x.shape[0]
    if not c_in:
        # with a strided px_map the input carries stride^2 more pixel
        # groups than px (the OUTPUT group count) — the default would tile
        # the wrong column width, so the caller must say what C is
        assert px_map is None, "px_map requires an explicit c_in"
        c_in = x.shape[1] // px
    n_out = w.shape[1]

    def fits(c):  # double-buffered in/out/res blocks (int8) + f32 epilogue
        out_b = 2 if out_kind == "bf16" else 1
        res_b = c * n_out if residual is not None else 0
        return (
            2 * (c * c_in + c_in * n_out + c * n_out * out_b + res_b)
            + 4 * c * n_out
            <= _VMEM_BUDGET
        )

    bm = bm or _pick_block(m, _BM_XL + (2880, 1024, 960, 512, 256, 128, 64, 32), fits)
    has_res = residual is not None
    kernel = functools.partial(
        _bmm_kernel,
        out_spec=(out_kind, in_scale, res_scale, out_scale, relu),
        has_res=has_res,
    )
    if px_map is None:
        x_col = lambda i, p: (i, p)
    else:
        stride, w_in, w_out = px_map
        x_col = lambda i, p: (i, stride * (p // w_out) * w_in
                              + stride * (p % w_out))
    in_specs = [
        pl.BlockSpec((bm, c_in), x_col, memory_space=pltpu.VMEM),
        pl.BlockSpec((c_in, n_out), lambda i, p: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_out), lambda i, p: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_out), lambda i, p: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, w, bias.reshape(1, n_out), w_scale.reshape(1, n_out)]
    if has_res:
        in_specs.append(
            pl.BlockSpec((bm, n_out), lambda i, p: (i, p),
                         memory_space=pltpu.VMEM)
        )
        args.append(residual)
    out_dtype = jnp.int8 if out_kind == "int8" else jnp.bfloat16
    return pl.pallas_call(
        kernel,
        grid=(m // bm, px),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, n_out), lambda i, p: (i, p),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, px * n_out), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * px * c_in * n_out,
            bytes_accessed=m * px * (c_in + n_out) + c_in * n_out,
            transcendentals=0,
        ),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(*args)
