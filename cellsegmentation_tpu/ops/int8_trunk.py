"""int8 Pallas trunk for stage-2 tile inference — the pipeline's hot loop.

Why int8 + chain fusion (docs/PERF.md): the dense tile sweep is 4.8 TFLOP
per 28.8k-tile step, which sits exactly at the v5e bf16 roofline for the
5k img-equiv/s target — only the 394 TOPS int8 MXU path has headroom. And
layers 1-2 are HBM-bound under XLA (an interblock [N,8,8,256] round trip per
bottleneck block), so the quantized trunk fuses each ResNet stage into ONE
Pallas kernel:

- weights live in VMEM for the whole chain (int8, per-output-channel scales
  from ops/quant.py's algebra); activations stream through in chunks of C
  tiles; every bottleneck block computes as int8 MXU GEMMs with int32
  accumulation and requantizes in-kernel, so interblock activations never
  touch HBM. Inter-STAGE activations cross HBM as int8 (4x cheaper than f32).
- 3x3 convs are 9 shift-sliced GEMMs against a zero-padded VMEM scratch
  (taps whose window is pure padding are skipped statically).
- stride-2 stage heads consume a space-to-depth'd input ([N,Ho,Wo,4C],
  one cheap XLA int8 reshape), which turns the strided taps into STATIC
  unit slices of parity planes: tap (di,dj) reads plane ((di+1)%2,(dj+1)%2)
  at row offset (0 if di==0 else 1). The 1x1 reduce runs per parity plane
  and the projection shortcut reads plane (0,0) (== x[:, ::2, ::2, :]).

Scale algebra per block (input scale s_in, calibrated h1/h2/out scales):
    h1_q = clip(round(acc1 * (s_in*s_w1/s1) + b1/s1), 0, 127)       [ReLU+quant]
    h2_q = clip(round(acc2 * (s1*s_w2/s2) + b2/s2), 0, 127)
    y_q  = clip(round(acc3 * (s2*s_w3/s_out) + b3/s_out + res), 0, 127)
    res  = proj ? accd * (s_in*s_wd/s_out) + bd/s_out : x_q * (s_in/s_out)

Behavior spec: reference/inference.py:9-28 (inference_tiles); tile geometry
reference/model/resnet.py:236-243. Numerical target: top-k tile *ranking*
fidelity vs the bf16 path (what stage-2 selection consumes).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cellsegmentation_tpu.ops.quant import quantize_weights

# ---------------------------------------------------------------------------
# Quantized parameter containers
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class QBlock:
    """One quantized bottleneck block (weights int8, epilogue vectors f32)."""

    w1: jnp.ndarray  # [Cin, Cm] int8 (1x1 reduce; per-plane for s2 heads)
    w2: jnp.ndarray  # [9, Cm, Cm] int8, tap-major (di*3+dj)
    w3: jnp.ndarray  # [Cm, Cout] int8 (1x1 expand)
    wd: Optional[jnp.ndarray]  # [Cin, Cout] int8 projection or None
    c1: np.ndarray  # [Cm] f32: s_in*s_w1/s1
    b1: np.ndarray  # [Cm] f32: bias1/s1
    c2: np.ndarray
    b2: np.ndarray
    c3: np.ndarray  # [Cout]
    b3: np.ndarray
    cd: Optional[np.ndarray]
    bd: Optional[np.ndarray]
    res_scale: float  # s_in/s_out (identity residual)


@dataclasses.dataclass
class QStage:
    blocks: List[QBlock]
    stride: int  # stride of block 0 (1 or 2); input must be s2d'd when 2
    cin: int  # channels BEFORE any s2d
    cm: int
    cout: int
    h_out: int
    w_out: int
    out_scale: float  # activation scale of the stage output


@dataclasses.dataclass
class QuantizedTrunk:
    stem_w: jnp.ndarray  # folded bf16 stem (stays XLA: 7x7 s2 conv is im2col-
    stem_b: jnp.ndarray  # unfriendly at 3 input channels and only ~3% of ops)
    x1_scale: float  # quantization scale of the post-maxpool stem output
    stages: List[QStage]

    def weight_tree(self):
        leaves = [self.stem_w, self.stem_b]
        for st in self.stages:
            for b in st.blocks:
                leaves += [b.w1, b.w2, b.w3]
                if b.wd is not None:
                    leaves.append(b.wd)
        return leaves


# ---------------------------------------------------------------------------
# XLA-side helpers
# ---------------------------------------------------------------------------


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """[N,H,W,C] -> [N,H/2,W/2,4C], plane p = 2*(row parity) + col parity."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def _tap_rows(d: int, size: int, stride: int) -> Optional[tuple]:
    """Static row mapping of 3x3 tap offset d for output extent ``size``.

    Returns (row_offset, parity) for stride 2 (parity-plane read) or
    (row_offset, None) for stride 1 (padded read); None = window is pure
    padding (tap statically skipped)."""
    if stride == 1:
        # padded data lives at rows [1, size+1) of [0, size+2)
        if d + size <= 1 or d >= size + 1:
            return None
        return d, None
    # stride 2: input row 2i+d-1 = 2*(i + a - 1) + r
    a = 0 if d == 0 else 1
    r = (d + 1) % 2
    if a == 0 and size == 1:  # reads only the zero pad row
        return None
    return a, r


# ---------------------------------------------------------------------------
# The fused stage kernel
# ---------------------------------------------------------------------------


def _dot_i8(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def _requant_relu(acc, combo, bias):
    """int32 acc -> relu -> requant -> int8 in [0, 127]."""
    y = acc.astype(jnp.float32) * combo + bias
    return jnp.clip(jnp.round(y), 0.0, 127.0).astype(jnp.int8)


def _expand_cols(m: int, cout: int) -> int:
    """Column-slice width for the expand GEMM keeping int32/f32 transients
    under ~4 MB."""
    for col in (512, 256, 128):
        if cout % col == 0 and m * col * 4 <= 4 * 1024 * 1024:
            return col
    return min(128, cout)


def quantized_chain(
    x_q: jnp.ndarray,
    blocks: Sequence[QBlock],
    *,
    stride: int,
    h_out: int,
    w_out: int,
    chunk: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run a chain of quantized bottleneck blocks as ONE Pallas kernel.

    x_q: int8 [N, H_out, W_out, Cin] (stride 1) or [N, H_out, W_out, 4*Cin]
    (stride 2, space-to-depth'd). Block 0 takes the stride; the rest are
    stride-1. Returns int8 [N, H_out, W_out, Cout].
    """
    n = x_q.shape[0]
    assert n % chunk == 0, (n, chunk)
    ho, wo = h_out, w_out
    m = chunk * ho * wo
    cm = blocks[0].w2.shape[-1]
    cout = blocks[-1].w3.shape[-1]
    # scratch channel width: stride-2 heads stage 4 parity planes of h1
    ch_scr = max(4 * cm if stride == 2 else cm, cm)

    # The head block (projection shortcut and/or stride) is unrolled; the
    # remaining blocks are shape-identical cout->cm->cout residual blocks and
    # run as ONE fori_loop over stacked weights — without this the unrolled
    # Mosaic program (e.g. layer3: 6 blocks x ~13 GEMMs) blows up compile.
    head: Optional[QBlock] = None
    reps = list(blocks)
    if stride == 2 or blocks[0].wd is not None:
        head, reps = blocks[0], reps[1:]
    for b in reps:
        assert b.wd is None and b.w1.shape == (cout, cm), "reps must be uniform"

    # epilogue vectors packed into f32 refs (Pallas kernels cannot capture
    # array constants): rows = [c1, b1, c2, b2] over cm and
    # [c3, b3, res_c, res_b] over cout, where res_c/res_b are the projection
    # combo/bias (head) or the identity residual scale (broadcast) for reps.
    def _packs(blist):
        cmp_ = np.zeros((max(len(blist), 1), 4, cm), np.float32)
        cop = np.zeros((max(len(blist), 1), 4, cout), np.float32)
        for i, b in enumerate(blist):
            cmp_[i] = np.stack([b.c1, b.b1, b.c2, b.b2])
            cop[i, 0], cop[i, 1] = b.c3, b.b3
            if b.wd is not None:
                cop[i, 2], cop[i, 3] = b.cd, b.bd
            else:
                cop[i, 2] = b.res_scale
        return jnp.asarray(cmp_), jnp.asarray(cop)

    cm_head, cout_head = _packs([head] if head else [])
    cm_rep, cout_rep = _packs(reps)

    flat_w = []
    if head is not None:
        flat_w += [head.w1, head.w2, head.w3]
        if head.wd is not None:
            flat_w.append(head.wd)
    n_head_w = len(flat_w)
    if reps:
        flat_w += [
            jnp.stack([b.w1 for b in reps]),
            jnp.stack([b.w2 for b in reps]),
            jnp.stack([b.w3 for b in reps]),
        ]

    col = _expand_cols(m, cout)

    def _taps(blk_stride):
        out = []
        for di in range(3):
            row = _tap_rows(di, ho, blk_stride)
            if row is None:
                continue
            for dj in range(3):
                colm = _tap_rows(dj, wo, blk_stride)
                if colm is None:
                    continue
                out.append((di * 3 + dj, row, colm))
        return out

    def kernel(x_ref, *refs):
        # out_ref doubles as the interblock staging buffer: every block in a
        # chain emits cout channels, so block k>0 reads the previous block's
        # output straight back from it (VMEM-resident until the grid step
        # completes) — no separate staging scratch.
        cmh_ref, coh_ref, cmr_ref, cor_ref = refs[-6], refs[-5], refs[-4], refs[-3]
        out_ref, pad_scr = refs[-2], refs[-1]
        w_refs = refs[:-6]
        pad_scr[:] = jnp.zeros_like(pad_scr)

        if head is not None:
            has_proj = head.wd is not None
            w1_ref, w2_ref, w3_ref = w_refs[0], w_refs[1], w_refs[2]
            wd_ref = w_refs[3] if has_proj else None
            s2 = stride == 2
            flat = x_ref[:].reshape(m, -1)
            c1, b1 = cmh_ref[0, 0:1, :], cmh_ref[0, 1:2, :]
            if s2:
                cin = flat.shape[-1] // 4
                for p in range(4):
                    h1p = _requant_relu(
                        _dot_i8(flat[:, p * cin : (p + 1) * cin], w1_ref[:]),
                        c1, b1,
                    )
                    pad_scr[:, 1 : ho + 1, 1 : wo + 1, p * cm : (p + 1) * cm] = (
                        h1p.reshape(chunk, ho, wo, cm)
                    )
                res_in = flat[:, :cin]  # parity plane (0,0) == x[:, ::2, ::2]
            else:
                h1 = _requant_relu(_dot_i8(flat, w1_ref[:]), c1, b1)
                pad_scr[:, 1 : ho + 1, 1 : wo + 1, :cm] = h1.reshape(
                    chunk, ho, wo, cm
                )
                res_in = flat
            acc = jnp.zeros((m, cm), jnp.int32)
            for t, (ai, ri), (aj, rj) in _taps(2 if s2 else 1):
                if s2:
                    p = ri * 2 + rj
                    win = pad_scr[:, ai : ai + ho, aj : aj + wo,
                                  p * cm : (p + 1) * cm]
                else:
                    win = pad_scr[:, ai : ai + ho, aj : aj + wo, :cm]
                acc = acc + _dot_i8(win.reshape(m, cm), w2_ref[t])
            h2 = _requant_relu(acc, cmh_ref[0, 2:3, :], cmh_ref[0, 3:4, :])
            for lo in range(0, cout, col):
                hi = lo + col
                y = (
                    _dot_i8(h2, w3_ref[:, lo:hi]).astype(jnp.float32)
                    * coh_ref[0, 0:1, lo:hi] + coh_ref[0, 1:2, lo:hi]
                )
                if has_proj:
                    y = y + (
                        _dot_i8(res_in, wd_ref[:, lo:hi]).astype(jnp.float32)
                        * coh_ref[0, 2:3, lo:hi] + coh_ref[0, 3:4, lo:hi]
                    )
                else:
                    y = y + (
                        res_in[:, lo:hi].astype(jnp.float32)
                        * coh_ref[0, 2:3, lo:hi]
                    )
                yq = jnp.clip(jnp.round(y), 0.0, 127.0).astype(jnp.int8)
                out_ref[:, :, :, lo:hi] = yq.reshape(chunk, ho, wo, col)
        else:
            # uniform chain: seed the staging buffer with the input
            out_ref[:] = x_ref[:]

        if reps:
            w1s_ref, w2s_ref, w3s_ref = w_refs[n_head_w:]
            taps = _taps(1)

            def rep_body(r, _):
                flat = out_ref[:].reshape(m, cout)
                h1 = _requant_relu(
                    _dot_i8(flat, w1s_ref[r]),
                    cmr_ref[r, 0:1, :], cmr_ref[r, 1:2, :],
                )
                pad_scr[:, 1 : ho + 1, 1 : wo + 1, :cm] = h1.reshape(
                    chunk, ho, wo, cm
                )
                acc = jnp.zeros((m, cm), jnp.int32)
                for t, (ai, _ri), (aj, _rj) in taps:
                    win = pad_scr[:, ai : ai + ho, aj : aj + wo, :cm]
                    acc = acc + _dot_i8(win.reshape(m, cm), w2s_ref[r, t])
                h2 = _requant_relu(
                    acc, cmr_ref[r, 2:3, :], cmr_ref[r, 3:4, :]
                )
                for lo in range(0, cout, col):
                    hi = lo + col
                    y = (
                        _dot_i8(h2, w3s_ref[r, :, lo:hi]).astype(jnp.float32)
                        * cor_ref[r, 0:1, lo:hi] + cor_ref[r, 1:2, lo:hi]
                        + flat[:, lo:hi].astype(jnp.float32)
                        * cor_ref[r, 2:3, lo:hi]
                    )
                    yq = jnp.clip(jnp.round(y), 0.0, 127.0).astype(jnp.int8)
                    out_ref[:, :, :, lo:hi] = yq.reshape(chunk, ho, wo, col)
                return 0

            jax.lax.fori_loop(0, len(reps), rep_body, 0)

    cin0 = x_q.shape[-1]
    in_specs = [
        pl.BlockSpec(
            (chunk, ho, wo, cin0), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    ] + [
        pl.BlockSpec(
            w.shape, lambda i, nd=w.ndim: (0,) * nd, memory_space=pltpu.VMEM
        )
        for w in flat_w
    ] + [
        pl.BlockSpec(
            v.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        )
        for v in (cm_head, cout_head, cm_rep, cout_rep)
    ]

    flops = 0
    for blk in blocks:
        per_px = (
            blk.w1.shape[0] * blk.w1.shape[1] * (4 if blk is blocks[0] and stride == 2 else 1)
            + 9 * cm * cm
            + cm * cout
            + (blk.wd.shape[0] * blk.wd.shape[1] if blk.wd is not None else 0)
        )
        flops += 2 * n * ho * wo * per_px

    return pl.pallas_call(
        kernel,
        grid=(n // chunk,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (chunk, ho, wo, cout), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, cout), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((chunk, ho + 2, wo + 2, ch_scr), jnp.int8),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x_q.size + n * ho * wo * cout,
            transcendentals=0,
        ),
        # v5e has 128 MB of physical VMEM per core; the compiler's default
        # 16 MB scoped limit is what forced round-1's kernel into 32-tile
        # chunks (900 grid steps of overhead, docs/PERF.md). Large chunks +
        # a raised limit are the whole point of the weight-stationary design.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(x_q, *flat_w, cm_head, cout_head, cm_rep, cout_rep)


# ---------------------------------------------------------------------------
# Calibration + trunk quantization (host-side, once per checkpoint)
# ---------------------------------------------------------------------------


def _act_scale(x) -> float:
    s = float(np.abs(np.asarray(x, np.float32)).max()) / 127.0
    return s if s > 0 else 1.0


def _instrumented_block(x, ws, stride):
    """f32 forward of one folded block on the HOST CPU, returning
    (y, (h1, h2)). Calibration must never touch the TPU: eager ops through
    the axon tunnel are pathologically slow (per-op round trips)."""
    has_proj = len(ws) == 8
    w1, b1, w2, b2, w3, b3 = [np.asarray(a, np.float32) for a in ws[:6]]
    n, h, w, cin = x.shape
    flat = x.reshape(-1, cin)
    h1 = np.maximum(flat @ w1 + b1, 0.0)
    with jax.default_device(jax.devices("cpu")[0]):
        h2 = np.asarray(
            jax.jit(
                lambda a, k: jax.lax.conv_general_dilated(
                    a, k, (stride, stride), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            )(jnp.asarray(h1.reshape(n, h, w, -1)), jnp.asarray(w2))
        )
    h2 = np.maximum(h2 + b2, 0.0)
    ho, wo = h2.shape[1], h2.shape[2]
    out = h2.reshape(-1, h2.shape[-1]) @ w3 + b3
    if has_proj:
        wd, bd = np.asarray(ws[6], np.float32), np.asarray(ws[7], np.float32)
        xs = x[:, ::stride, ::stride, :] if stride > 1 else x
        res = xs.reshape(-1, cin) @ wd + bd
    else:
        res = flat
    y = np.maximum(out + res, 0.0).reshape(n, ho, wo, -1)
    return y, (h1, h2.reshape(-1, h2.shape[-1]))


def quantize_trunk(folded, calib_x1: np.ndarray) -> QuantizedTrunk:
    """Quantize a FoldedTrunk (ops/infer_engine.fold_tile_trunk) using a
    pilot batch of post-stem activations ``calib_x1`` [B, 8, 8, 64] f32 for
    max-abs activation calibration."""
    x = np.asarray(calib_x1, np.float32)
    x1_scale = _act_scale(x)
    # calibrate on the dequantized pilot so downstream scales see the same
    # quantization error the kernel produces
    x = np.clip(np.round(x / x1_scale), 0, 127) * x1_scale

    stages = []
    s_in = x1_scale
    for si, (stage_ws, stride) in enumerate(zip(folded.stages, folded.strides)):
        qblocks = []
        for bi, ws in enumerate(stage_ws):
            blk_stride = stride if bi == 0 else 1
            y, (h1, h2) = _instrumented_block(x, ws, blk_stride)
            s1, s2, s_out = _act_scale(h1), _act_scale(h2), _act_scale(y)

            has_proj = len(ws) == 8
            w1, b1, w2, b2, w3, b3 = ws[:6]
            w1_q, sw1 = quantize_weights(np.asarray(w1, np.float32), axis=-1)
            w2_np = np.asarray(w2, np.float32).reshape(
                9, w2.shape[2], w2.shape[3]
            )
            w2_q, sw2 = quantize_weights(w2_np, axis=-1)
            w3_q, sw3 = quantize_weights(np.asarray(w3, np.float32), axis=-1)
            b1 = np.asarray(b1, np.float32)
            b2 = np.asarray(b2, np.float32)
            b3 = np.asarray(b3, np.float32)
            if has_proj:
                wd_q, swd = quantize_weights(np.asarray(ws[6], np.float32), -1)
                cd = (s_in * np.asarray(swd) / s_out).astype(np.float32)
                bd = (np.asarray(ws[7], np.float32) / s_out).astype(np.float32)
            else:
                wd_q, cd, bd = None, None, None
            qblocks.append(
                QBlock(
                    w1=w1_q, w2=w2_q, w3=w3_q, wd=wd_q,
                    c1=(s_in * np.asarray(sw1) / s1).astype(np.float32),
                    b1=(b1 / s1).astype(np.float32),
                    c2=(s1 * np.asarray(sw2) / s2).astype(np.float32),
                    b2=(b2 / s2).astype(np.float32),
                    c3=(s2 * np.asarray(sw3) / s_out).astype(np.float32),
                    b3=(b3 / s_out).astype(np.float32),
                    cd=cd, bd=bd,
                    res_scale=float(s_in / s_out),
                )
            )
            # quantize the pilot like the kernel will, then continue in f32
            x = np.clip(np.round(y / s_out), 0, 127) * s_out
            s_in = s_out
        stages.append(
            QStage(
                blocks=qblocks,
                stride=stride,
                cin=stage_ws[0][0].shape[0],
                cm=qblocks[0].w2.shape[-1],
                cout=qblocks[-1].w3.shape[-1],
                h_out=x.shape[1],
                w_out=x.shape[2],
                out_scale=s_in,
            )
        )
    return QuantizedTrunk(
        stem_w=folded.stem_w, stem_b=folded.stem_b,
        x1_scale=x1_scale, stages=stages,
    )


# ---------------------------------------------------------------------------
# Full trunk forward
# ---------------------------------------------------------------------------

# VMEM budget for picking the tile chunk per stage kernel (double-buffered io
# + scratches + transients + resident weights; the kernels raise the scoped
# limit to 100 MB of v5e's 128 MB physical VMEM, and the estimate below is
# deliberately coarse, so leave generous headroom).
_VMEM_BUDGET = 56 * 1024 * 1024

# Stages/sub-chains whose resident weights exceed this split into smaller
# chains (layer4's 15 MB int8 weights cannot co-reside with activations).
_MAX_CHAIN_WEIGHTS = 8 * 1024 * 1024


def _chain_weight_bytes(blocks: Sequence[QBlock]) -> int:
    total = 0
    for b in blocks:
        for w in (b.w1, b.w2, b.w3, b.wd):
            if w is not None:
                total += int(np.prod(w.shape))
    return total


def _split_chains(blocks: List[QBlock]) -> List[List[QBlock]]:
    chains, cur, cur_bytes = [], [], 0
    for b in blocks:
        nb = _chain_weight_bytes([b])
        if cur and cur_bytes + nb > _MAX_CHAIN_WEIGHTS:
            chains.append(cur)
            cur, cur_bytes = [], 0
        cur.append(b)
        cur_bytes += nb
    if cur:
        chains.append(cur)
    return chains


def _pick_chunk(n: int, per_tile_bytes: int, fixed_bytes: int) -> int:
    """Largest divisor of n (of the preferred ladder) fitting the budget."""
    for c in (256, 192, 128, 96, 64, 32, 16, 8):
        if n % c == 0 and fixed_bytes + c * per_tile_bytes <= _VMEM_BUDGET:
            return c
    return max(cc for cc in (4, 2, 1) if n % cc == 0)


def _stage_chunk(st: QStage, chain: Sequence[QBlock], n: int, cin_eff: int) -> int:
    px = st.h_out * st.w_out
    ch_scr = 4 * st.cm if (st.stride == 2 and chain[0] is st.blocks[0]) else st.cm
    col = _expand_cols(px * 64, st.cout)  # pessimistic column width
    per_tile = (
        2 * px * cin_eff  # in (double-buffered)
        + 2 * px * st.cout  # out (doubles as interblock staging)
        + (st.h_out + 2) * (st.w_out + 2) * ch_scr  # padded scratch
        # live GEMM transients: int32 3x3 accumulator + int8 h1/h2 + the
        # block input held for the residual + expand int32/f32/int8 slices
        + px * (4 * st.cm + 2 * st.cm + max(cin_eff, st.cout) + 12 * col)
    )
    return _pick_chunk(n, per_tile, _chain_weight_bytes(chain))


def int8_trunk_forward(
    qt: QuantizedTrunk, x: jnp.ndarray, interpret: Optional[bool] = None
) -> jnp.ndarray:
    """Normalized tiles bf16 [N, ts, ts, 3] -> f32 stage-4 features.

    Stem + maxpool run as XLA bf16 (7x7 conv on 3 channels: ~3% of trunk
    ops); everything after is the int8 Pallas chain per stage.
    """
    from cellsegmentation_tpu.ops.infer_engine import _conv_bias_relu

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    n = x.shape[0]
    x = _conv_bias_relu(
        x.astype(jnp.bfloat16), qt.stem_w, qt.stem_b, 2, ((3, 3), (3, 3))
    )
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    x_q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / qt.x1_scale), 0, 127
    ).astype(jnp.int8)

    for st in qt.stages:
        if st.stride == 2:
            x_q = space_to_depth(x_q)
        for chain in _split_chains(st.blocks):
            is_head_chain = chain[0] is st.blocks[0]
            chunk = _stage_chunk(st, chain, n, x_q.shape[-1])
            x_q = quantized_chain(
                x_q, chain,
                stride=st.stride if is_head_chain else 1,
                h_out=st.h_out, w_out=st.w_out, chunk=chunk,
                interpret=interpret,
            )
    return x_q.astype(jnp.float32) * qt.stages[-1].out_scale


def make_int8_tile_logits(model, variables, calib_tiles: np.ndarray):
    """Build the int8 fast path: (head_params, tiles bf16 [N,ts,ts,3]) ->
    logits [N, 2]. Returns (fn, quantized_trunk) or None if the encoder
    isn't foldable. ``calib_tiles`` is a normalized f32/bf16 pilot batch.
    """
    from cellsegmentation_tpu.ops.infer_engine import (
        _conv_bias_relu,
        fold_tile_trunk,
    )

    folded = fold_tile_trunk(model, variables)
    if folded is None:
        return None

    # pilot through the stem on the host CPU (calibration stays off the TPU)
    with jax.default_device(jax.devices("cpu")[0]):
        def stem(x):
            x = _conv_bias_relu(x, folded.stem_w, folded.stem_b, 2, ((3, 3), (3, 3)))
            return jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                ((0, 0), (1, 1), (1, 1), (0, 0)),
            )

        xc = np.asarray(
            jax.jit(stem)(jnp.asarray(np.asarray(calib_tiles), jnp.bfloat16)),
            np.float32,
        )
    qt = quantize_trunk(folded, xc)

    def logits_fn(head_params, x):
        x4 = int8_trunk_forward(qt, x)
        pooled = jnp.mean(x4, axis=(1, 2)) + jnp.max(x4, axis=(1, 2))
        dense = head_params["Dense_0"]
        return (
            jax.lax.dot_general(
                pooled.astype(jnp.bfloat16),
                dense["kernel"].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + dense["bias"]
        )

    return logits_fn, qt
