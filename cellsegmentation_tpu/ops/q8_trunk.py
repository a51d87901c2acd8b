"""Stage-2 serving trunk layers 2-4 as per-conv Pallas int8 GEMMs.

The 32x32-tile geometry leaves layers 2-4 operating on tiny spatial maps
(8/4/2/1 px a side) where a 3x3 conv's im2col either inflates traffic 9x
or pads most taps with zeros. The TPU-native formulation used here is the
**whole-tile GEMM**: for a conv on an [h, w, C] tile map, build the dense
matrix W'[(hi,wi,ci), (ho,wo,co)] = K[dy,dx,ci,co] (dy = ho*s + .. - hi
etc., zeros elsewhere) so the whole conv — every output pixel, every tap,
zero padding included — is ONE [N, h*w*C] x [h*w*C, h'*w'*C'] int8 GEMM.
This matches the per-tile zero-padded conv *exactly* (modulo int8
rounding), needs no im2col materialization, and runs at 318-375 TOPS
measured (tools/microbench_int8.py) because K is large and dense.

1x1 convs are plain [N*px, C] GEMMs; b1 projections subsample with an XLA
strided slice then GEMM. Residual adds ride the c3 GEMM epilogue
(ops/q8_gemm.py), so every inter-op tensor crosses HBM as int8; only the
final block's output leaves as bf16 for the pooling head.

Reference behavior spec: the frozen-encoder tile forward of
model/resnet.py:236-303 (geometry comments) driven by inference.py:9-28;
valid while the encoder stays frozen, i.e. the whole stage-2 cycle
(model/resnet.py:315-319).
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cellsegmentation_tpu.ops.q8_gemm import (
    q8_conv3_rowtap,
    q8_conv3_tap,
    q8_matmul,
    q8_matmul_px,
)

# Pad the tile-batch dimension so every GEMM M (= tiles * px) hits an
# aligned block size (960 divides 43200 and keeps M a multiple of 32*px).
TILE_ALIGN = 960

# 3x3 formulation per block: "wholetile" (Toeplitz GEMM), "tap"
# (tap-accumulating conv, ops/q8_gemm.py::q8_conv3_tap), "rowtap"
# (row-Toeplitz dots, ops/q8_gemm.py::q8_conv3_rowtap), or "auto" — tap
# when the block's input map has more than 9 pixels (the Toeplitz GEMM
# re-multiplies px_in/9 redundant K-columns per output pixel: 7.1x at
# 8x8, 1.8x at 4x4; at <=9 px the dense-K wholetile GEMM runs at higher
# MXU rates than 9 small-K dots). The three forms are BIT-IDENTICAL
# (tests/test_q8_trunk.py) — this is a pure perf knob.
W2_IMPL = "auto"

# Grouped (ResNeXt) 3x3 formulation: "blockdiag" routes the expanded
# block-diagonal kernel through the ungrouped impls above (g x redundant
# MACs at the dense rate, no relayout); "gdot" keeps the groups as a
# batched per-group whole-tile dot (zero redundancy, pays two [N, px, g,
# cg] relayouts per conv and a g-batched small-N dot). The two are
# BIT-IDENTICAL (tests/test_q8_trunk.py) — a pure perf knob, A/B'd on
# hardware by tools/bench_grouped.py.
GROUPED_IMPL = os.environ.get("CST_GROUPED_IMPL", "blockdiag")


def _w2_impl(h: int, w: int) -> str:
    if W2_IMPL != "auto":
        return W2_IMPL
    return "tap" if h * w > 9 else "wholetile"


def _per_channel_scale(k: np.ndarray) -> np.ndarray:
    """absmax scale per output channel (last axis) of a folded kernel."""
    s = np.abs(k).reshape(-1, k.shape[-1]).max(axis=0) / 127.0
    return np.where(s > 0, s, 1.0).astype(np.float32)


def _quant_w(k: np.ndarray, scale: np.ndarray) -> np.ndarray:
    return np.clip(np.round(k / scale), -127, 127).astype(np.int8)


def _expand_grouped(k2: np.ndarray, groups: int) -> np.ndarray:
    """Grouped HWIO conv kernel [kh,kw,C/g,C'] -> dense block-diagonal
    [kh,kw,C,C'] (zeros off the group diagonal), so the grouped 3x3
    (ResNeXt, model/resnext.py:418-442 in the reference) runs through the
    UNCHANGED ungrouped whole-tile/tap kernels. g x redundant MACs, but at
    the trunk's tiny spatial maps the dense int8 GEMM rate beats XLA's
    padded-tap grouped conv (tools/bench_grouped.py)."""
    kh, kw, cing, cout = k2.shape
    coutg = cout // groups
    big = np.zeros((kh, kw, cing * groups, cout), k2.dtype)
    for gi in range(groups):
        big[:, :, gi * cing : (gi + 1) * cing,
            gi * coutg : (gi + 1) * coutg] = (
            k2[:, :, :, gi * coutg : (gi + 1) * coutg]
        )
    return big


def _wholetile_weight(k2: np.ndarray, h: int, w: int, stride: int):
    """[3,3,C,C'] folded conv kernel -> dense whole-tile GEMM weight.

    Returns (W' [h*w*C, h'*w'*C'] f32, h', w'). Entry layout matches the
    row-major [N, h, w, C] <-> [N, h*w*C] reshape on both sides, so the
    GEMM is exactly conv_general_dilated(pad=1, stride) on the tile.
    """
    kh, kw, c_in, c_out = k2.shape
    ho = (h + 2 - kh) // stride + 1
    wo = (w + 2 - kw) // stride + 1
    big = np.zeros((h * w * c_in, ho * wo * c_out), dtype=np.float32)
    for oy in range(ho):
        for ox in range(wo):
            for dy in range(kh):
                for dx in range(kw):
                    hi = stride * oy + dy - 1
                    wi = stride * ox + dx - 1
                    if 0 <= hi < h and 0 <= wi < w:
                        r = (hi * w + wi) * c_in
                        c = (oy * wo + ox) * c_out
                        big[r : r + c_in, c : c + c_out] = k2[dy, dx]
    return big, ho, wo


def _rowtap_weight(k2: np.ndarray, w_in: int, stride: int):
    """[3,3,C,C'] folded conv kernel -> dy-major row-Toeplitz GEMM weight.

    Returns (W [3*w_in*C, w_out*C'] f32, w_out). Plane dy holds, at band
    (wi, wo), K[dy, wi - stride*wo + 1] — one whole-input-row dot per
    (output row, dy) covers every dx tap at once (q8_conv3_rowtap).
    """
    _, kw, c_in, c_out = k2.shape
    w_out = (w_in - 1) // stride + 1
    big = np.zeros((3 * w_in * c_in, w_out * c_out), dtype=np.float32)
    for dy in range(3):
        for wo in range(w_out):
            for dx in range(kw):
                wi = stride * wo + dx - 1
                if 0 <= wi < w_in:
                    r = (dy * w_in + wi) * c_in
                    c = wo * c_out
                    big[r : r + c_in, c : c + c_out] = k2[dy, dx]
    return big, w_out


@dataclasses.dataclass(frozen=True)
class QBlockMeta:
    """Static per-block config (baked into the jitted program)."""

    h_in: int
    w_in: int
    h_out: int
    w_out: int
    c_in: int
    c_mid: int
    c_out: int
    stride: int
    s_in: float
    s_h1: float
    s_h2: float
    s_res: float  # residual scale: s_in (identity) or the proj-out scale
    s_out: Optional[float]  # None -> final block, bf16 out
    has_proj: bool
    w2_impl: str = "wholetile"  # "wholetile" | "tap" | "rowtap" | "gdot"
    groups: int = 1  # >1 only with w2_impl="gdot" (batched per-group dot)


def build_q8_backend(folded, scales, h_in: int, w_in: int,
                     first_stage: int = 1, first_block: int = 0):
    """(FoldedTrunk, deep TrunkScales, stage input spatial) ->
    (params pytree, [QBlockMeta]) for layers ``first_stage+1``..4.

    ``scales`` must be calibrated with deep=True (h1/h2 at every stage +
    proj + block_out); ``h_in`` x ``w_in`` is the input patch size of the
    FIRST INCLUDED block — (first_stage, first_block). The split is
    block-granular because Toeplitz redundancy is a per-block property of
    the input spatial size: layer2 block0's 3x3 at 8x8 px is 7x
    FLOP-redundant as a whole-tile GEMM (stays in XLA conv-land), while
    blocks 1-3 at 4x4 px are only 1.8x redundant and win as GEMMs.
    """
    params: List[dict] = []
    metas: List[QBlockMeta] = []
    h, w = h_in, w_in
    n_stages = len(folded.stages)
    for si in range(first_stage, n_stages):
        stride = folded.strides[si]
        for bi, ws in enumerate(folded.stages[si]):
            if si == first_stage and bi < first_block:
                continue
            blk_stride = stride if bi == 0 else 1
            w1, b1, w2, b2, w3, b3 = [np.asarray(a, np.float32) for a in ws[:6]]
            grouped = getattr(folded, "groups", 1) > 1
            if grouped and GROUPED_IMPL != "gdot":
                w2 = _expand_grouped(w2, folded.groups)
            has_proj = len(ws) == 8
            c_in = w1.shape[2]
            c_mid = w1.shape[3]
            c_out = w3.shape[3]

            s1 = _per_channel_scale(w1[0, 0])
            s2c = _per_channel_scale(w2)  # per co (grouped or dense kernel)
            w2_impl = (
                "gdot" if grouped and GROUPED_IMPL == "gdot" else _w2_impl(h, w)
            )
            if w2_impl == "gdot":
                # per-group whole-tile Toeplitz, batched over groups:
                # [g, px_in*cg, px_out*cog]; bias/scales tiled per group
                gr = folded.groups
                cog = c_mid // gr
                mats, biases, scs = [], [], []
                for gi in range(gr):
                    kg = w2[:, :, :, gi * cog : (gi + 1) * cog]
                    big_g, ho, wo = _wholetile_weight(kg, h, w, blk_stride)
                    sg = s2c[gi * cog : (gi + 1) * cog]
                    mats.append(_quant_w(big_g, np.tile(sg, ho * wo)))
                    biases.append(np.tile(b2[gi * cog : (gi + 1) * cog], ho * wo))
                    scs.append(np.tile(sg, ho * wo))
                w2q = np.stack(mats)
                b2q, s2q = np.stack(biases), np.stack(scs)
            elif w2_impl == "tap":
                # tap-major [9*c_mid, c_mid] rows (dy*3+dx)*c_mid + ci —
                # the row-major reshape of the HWIO kernel
                ho = (h - 1) // blk_stride + 1
                wo = (w - 1) // blk_stride + 1
                w2q = _quant_w(w2.reshape(9 * c_mid, c_mid), s2c)
                b2q, s2q = b2, s2c
            elif w2_impl == "rowtap":
                big2, wo = _rowtap_weight(w2, w, blk_stride)
                ho = (h - 1) // blk_stride + 1
                w2q = _quant_w(big2, np.tile(s2c, wo))
                b2q, s2q = np.tile(b2, wo), np.tile(s2c, wo)
            else:
                big2, ho, wo = _wholetile_weight(w2, h, w, blk_stride)
                w2q = _quant_w(big2, np.tile(s2c, ho * wo))
                b2q, s2q = np.tile(b2, ho * wo), np.tile(s2c, ho * wo)
            s3 = _per_channel_scale(w3[0, 0])

            # host (numpy) leaves: the caller device_puts the whole params
            # list in ONE batched transfer (per-tensor puts are one tunnel
            # RPC each — a measured chunk of the stage-3 engine build)
            p = {
                "w1": _quant_w(w1[0, 0], s1),
                "b1": b1,
                "s1": s1,
                "w2": w2q,
                "b2": np.asarray(b2q, np.float32),
                "s2": np.asarray(s2q, np.float32),
                "w3": _quant_w(w3[0, 0], s3),
                "b3": b3,
                "s3": s3,
            }
            if has_proj:
                wd, bd = np.asarray(ws[6], np.float32), np.asarray(ws[7], np.float32)
                sp = _per_channel_scale(wd[0, 0])
                p.update(
                    wp=_quant_w(wd[0, 0], sp),
                    bp=bd,
                    sp=sp,
                )

            is_final = si == n_stages - 1 and bi == len(folded.stages[si]) - 1
            s_in = float(
                scales.block_out[si - 1][-1] if bi == 0
                else scales.block_out[si][bi - 1]
            )
            s_res = float(scales.proj[si][bi]) if has_proj else s_in
            metas.append(
                QBlockMeta(
                    h_in=h, w_in=w, h_out=ho, w_out=wo,
                    c_in=c_in, c_mid=c_mid, c_out=c_out, stride=blk_stride,
                    s_in=s_in,
                    s_h1=float(scales.h1[si][bi]),
                    s_h2=float(scales.h2[si][bi]),
                    s_res=s_res,
                    s_out=None if is_final else float(scales.block_out[si][bi]),
                    has_proj=has_proj,
                    w2_impl=w2_impl,
                    groups=folded.groups if w2_impl == "gdot" else 1,
                )
            )
            params.append(p)
            h, w = ho, wo
    return params, metas


def q8_backend_forward(params, metas, xq, interpret: bool = False,
                       first_h1=None, first_res=None):
    """int8 layer1-output patches [N, px*C] in WHOLE-TILE layout (quantized
    with the stage-0 block_out scale, col = (h*w_in + w)*C + c) -> bf16
    final features [N, pxf*Cf].

    Every activation stays [N, px*C] row-major end to end: 1x1 convs are
    batched GEMMs over the px grid axis (q8_matmul_px), 3x3s are whole-tile
    GEMMs, the b1 projection subsamples via a static column index map — so
    no reshape or relayout ever materializes between kernels (TPU tiled
    layouts make [N*px, C] <-> [N, px*C] reshapes real 1-2 ms copies, which
    dominated the first integration's profile).

    ``first_h1``/``first_res`` (both required together, first block must
    carry a projection): the first block's 1x1-reduce and projection
    outputs precomputed in CONV-land (already int8 at s_h1/s_res, whole-
    tile flat). Entering GEMM-land after them means the retile at the
    conv->GEMM boundary happens on the c_mid-wide h1 instead of the
    4x-wider block input (measured 5.2 ms of copy+reshape on the dense
    frontend's [43200, 8*8*256] entry); ``xq`` may then be None.

    N must be a multiple of TILE_ALIGN (pad with garbage tiles and mask
    downstream; every op here is per-tile independent).
    """
    for i, (p, m) in enumerate(zip(params, metas)):
        px_in = m.h_in * m.w_in
        px_out = m.h_out * m.w_out
        if i == 0 and first_h1 is not None:
            h1 = first_h1
            res = first_res
        else:
            h1 = q8_matmul_px(
                xq, p["w1"], p["b1"], p["s1"], px=px_in, c_in=m.c_in,
                in_scale=m.s_in, out_scale=m.s_h1, interpret=interpret,
            )
            if m.has_proj:
                res = q8_matmul_px(
                    xq, p["wp"], p["bp"], p["sp"], px=px_out, c_in=m.c_in,
                    px_map=(m.stride, m.w_in, m.w_out),
                    in_scale=m.s_in, out_scale=m.s_res, relu=False,
                    interpret=interpret,
                )
            else:
                res = xq
        if m.w2_impl == "gdot":
            g, cg = m.groups, m.c_mid // m.groups
            n = h1.shape[0]
            h1g = (
                h1.reshape(n, px_in, g, cg)
                .transpose(2, 0, 1, 3)
                .reshape(g, n, px_in * cg)
            )
            acc = jax.lax.dot_general(
                h1g, p["w2"], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )
            # the exact _mm_kernel epilogue (ops/q8_gemm.py), batched over g
            y = acc.astype(jnp.float32) * (m.s_h1 * p["s2"][:, None, :])
            y = jnp.maximum(y + p["b2"][:, None, :], 0.0)
            h2 = (
                jnp.clip(jnp.round(y * (1.0 / m.s_h2)), -127, 127)
                .astype(jnp.int8)
                .reshape(g, n, px_out, cg)
                .transpose(1, 2, 0, 3)
                .reshape(n, px_out * m.c_mid)
            )
        elif m.w2_impl == "tap":
            h2 = q8_conv3_tap(
                h1, p["w2"], p["b2"], p["s2"],
                h_in=m.h_in, w_in=m.w_in, stride=m.stride, c_in=m.c_mid,
                in_scale=m.s_h1, out_scale=m.s_h2, interpret=interpret,
            )
        elif m.w2_impl == "rowtap":
            h2 = q8_conv3_rowtap(
                h1, p["w2"], p["b2"], p["s2"],
                h_in=m.h_in, w_in=m.w_in, stride=m.stride, c_in=m.c_mid,
                in_scale=m.s_h1, out_scale=m.s_h2, interpret=interpret,
            )
        else:
            h2 = q8_matmul(
                h1, p["w2"], p["b2"], p["s2"],
                out_kind="int8", in_scale=m.s_h1, out_scale=m.s_h2,
                interpret=interpret,
            )
        xq = q8_matmul_px(
            h2, p["w3"], p["b3"], p["s3"], residual=res, px=px_out,
            c_in=m.c_mid, res_scale=m.s_res,
            out_kind="bf16" if m.s_out is None else "int8",
            in_scale=m.s_h2,
            out_scale=1.0 if m.s_out is None else m.s_out,
            interpret=interpret,
        )
    return xq
