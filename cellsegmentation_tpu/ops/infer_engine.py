"""Serving engine for the stage-2 tile hot loop: folded-BN all-conv trunk
with int8 activation sandwiches ("q8").

What won and why (full measurement story in docs/PERF.md): on v5e through
this XLA/Mosaic stack, hand-fused Pallas chains (bf16 AND int8) bottom out
at ~28 TOPS — chained in-kernel dots pay an operand-repacking relayout per
step that dwarfs the MXU time at tile-scale shapes — while XLA's own conv
emitters sustain near-peak MXU rates. So the engine keeps XLA convs for ALL
compute and attacks the remaining bandwidth bound instead:

- BatchNorm folded into conv weights once per checkpoint (the encoder is
  frozen during stage 2, reference: model/resnet.py:315-319, so folding
  stays valid across the whole inference→select→train cycle);
- every conv emits bf16 (f32 outputs double the HBM write traffic);
- activations crossing HBM between (and inside) bottleneck blocks are
  quantized to int8 with per-tensor calibrated scales and dequantized at
  the consumer — a 2x traffic cut on the bandwidth-bound stages. The
  quantize/dequantize fuse into the producing/consuming conv fusions.

Measured: 53.2 ms -> 44.8 ms per 28.8k-tile step (+19% throughput) with
top-k ranking fidelity preserved (tests/test_infer_engine.py).

Numerics: identical math to model.apply(..., mode="tile", train=False)
modulo bf16 rounding and ±1 LSB int8 activation quantization. The target
is stage-2's prob *ranking* (top-k selection), validated directly.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cellsegmentation_tpu.models.milnet import MILNet
from cellsegmentation_tpu.models.resnet import Bottleneck, ResNetEncoder

# int8 sandwiches go: between all blocks of the first _SANDWICH_STAGES
# stages AND around the 3x3 (h1/h2) inside the first _INTRA_STAGES stages.
# Measured marginal gains flatten past these depths (docs/PERF.md).
_SANDWICH_STAGES = 4
_INTRA_STAGES = 2

# Stem formulation switches (perf experiment knobs, bit-identical math):
# "s2d" packs the 3-channel 7x7/s2 stem into a 12-channel 4x4/s1 conv;
# "shift" replaces the reduce_window maxpool with 9 strided-slice maxes.
_STEM_IMPL = "conv"  # "conv" | "s2d"
_POOL_IMPL = "reduce_window"  # "reduce_window" | "shift"

# Gutter-packed mosaic formulation of the q8dg chain's conv-land layer2
# (the last unexplored stage-2 formulation family, VERDICT r4 #3): pack the
# 8x8-px tiles into large canvases with 2-px zero gutters so XLA's 3x3
# convs run at large-map MXU utilization instead of the ~50% small-spatial
# rate, re-zeroing the gutters each 3x3 reads (exact per-tile-zero-pad
# semantics). 1.56x spatial overhead; A/B via CST_L2_MOSAIC=1.
_L2_MOSAIC = os.environ.get("CST_L2_MOSAIC", "") == "1"

# Grouped (ResNeXt) trunks in the DENSE engine's GEMM backend: the grouped
# 3x3s run block-diagonally expanded (ops/q8_trunk.py::_expand_grouped,
# g x redundant MACs at the dense int8 rate). Off by default pending the
# hardware A/B — the dense+conv split already measured is not regressed.
# Per-tile q8g always honors grouped (explicit-request path).
_GROUPED_GEMM = os.environ.get("CST_GROUPED_GEMM", "") == "1"
_L2_MOSAIC_K = int(os.environ.get("CST_L2_MOSAIC_K", "24") or 24)


def fold_conv_bn(kernel, scale, bias, mean, var, eps: float = 1e-5):
    """conv(x, w) -> BN  ≡  conv(x, w·g) + (b - m·g), g = γ/√(σ²+ε).

    Returns HOST (numpy) bf16/f32 arrays: folding runs on already-fetched
    weights and the finished tree crosses to the device ONCE per build
    (``jax.device_put`` at the call sites). Per-tensor jnp wrapping here
    used to cost one tunnel RPC per array — ~10 s of the stage-3 engine
    build (docs/PERF.md)."""
    g = np.asarray(scale) / np.sqrt(np.asarray(var) + eps)
    w = (np.asarray(kernel) * g).astype(np.float32)
    b = (np.asarray(bias) - np.asarray(mean) * g).astype(np.float32)
    return w.astype(jnp.bfloat16), b


def _fold_cba(params: dict, stats: dict):
    return fold_conv_bn(
        params["Conv_0"]["kernel"],
        np.asarray(params["BatchNorm_0"]["scale"]),
        np.asarray(params["BatchNorm_0"]["bias"]),
        np.asarray(stats["BatchNorm_0"]["mean"]),
        np.asarray(stats["BatchNorm_0"]["var"]),
    )


@dataclasses.dataclass
class FoldedTrunk:
    """Folded weights, grouped per stage: [(block0 weights), (block1), ...].

    ``kind`` is "bottleneck" (1×1/3×3/1×1, reference model/resnet.py:52-90)
    or "basic" (3×3/3×3, :22-49); grouped 3×3s (ResNeXt) carry ``groups``.
    """

    stem_w: jnp.ndarray
    stem_b: jnp.ndarray
    stages: list  # list of stages; each stage = list of block weight tuples
    strides: list  # per-stage stride of block 0
    kind: str = "bottleneck"
    groups: int = 1

    def tree(self):
        return (self.stem_w, self.stem_b, self.stages)


def fold_tile_trunk(model: MILNet, variables: dict) -> Optional[FoldedTrunk]:
    """Fold a ResNet-family MILNet encoder (Bottleneck incl. grouped
    ResNeXt, BasicBlock); None for EfficientNet, whose MBConv stack folds
    through its own walk (ops/effnet_engine.py)."""
    enc = model.encoder
    if not isinstance(enc, ResNetEncoder):
        return None
    from cellsegmentation_tpu.models.resnet import BasicBlock

    if enc.block_cls is Bottleneck:
        kind = "bottleneck"
    elif enc.block_cls is BasicBlock and int(enc.groups) == 1:
        # _conv_basic has no grouped path; an unknown block class must NOT
        # be folded with a guessed layout — fall back to the exact flax
        # graph instead of serving silently-wrong probs
        kind = "basic"
    else:
        return None
    n_convs = 3 if kind == "bottleneck" else 2

    # one batched device->host fetch for the whole encoder: folding reads
    # every tensor, and per-array fetches are one tunnel round-trip each
    params = jax.device_get(variables["params"]["encoder"])
    stats = jax.device_get(variables["batch_stats"]["encoder"])
    stem_w, stem_b = fold_conv_bn(
        params["conv1"]["kernel"],
        np.asarray(params["bn1"]["scale"]),
        np.asarray(params["bn1"]["bias"]),
        np.asarray(stats["bn1"]["mean"]),
        np.asarray(stats["bn1"]["var"]),
    )
    stages = []
    strides = []
    for s, blocks in enumerate(enc.stage_sizes):
        stage = []
        for b in range(blocks):
            key = f"layer{s + 1}_{b}"
            bp, bs = params[key], stats[key]
            ws = []
            # bottleneck: ConvBNAct_0/1/2 = 1×1 / 3×3 / 1×1, _3 = projection
            # basic:      ConvBNAct_0/1   = 3×3 / 3×3,       _2 = projection
            for ci in range(n_convs):
                w, bias = _fold_cba(bp[f"ConvBNAct_{ci}"], bs[f"ConvBNAct_{ci}"])
                ws.extend([w, bias])
            proj_key = f"ConvBNAct_{n_convs}"
            if proj_key in bp:
                wd, bd = _fold_cba(bp[proj_key], bs[proj_key])
                ws.extend([wd, bd])
            stage.append(tuple(ws))
        stages.append(stage)
        strides.append(1 if s == 0 else 2)
    return FoldedTrunk(
        stem_w=stem_w, stem_b=stem_b, stages=stages, strides=strides,
        kind=kind, groups=int(enc.groups),
    )


# ---------------------------------------------------------------------------
# Forward path
# ---------------------------------------------------------------------------


def _conv_bias_relu(x, w, b, stride: int, padding):
    y = jax.lax.conv_general_dilated(
        x, w.astype(jnp.bfloat16), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16,
    )
    return jnp.maximum(y + b.astype(jnp.bfloat16), 0)


def _stem_s2d(x, w, b):
    """7x7/s2 pad-3 stem conv as space-to-depth + 4x4/s1 VALID conv.

    y[p] = sum_k w[k] x[2p+k-3] with k = 2a+b becomes a stride-1 conv over
    2x2-packed input planes: 3 input channels at C_in=3 are MXU-hostile
    (the K dim of the implied GEMM is 7*3=21 per row); packing lifts K to
    4*4*12. Bit-identical output (same taps, same zero padding).
    """
    g, h, wd, c = x.shape
    kh = w.shape[0]  # 7
    # pad so every tap index 2p+k-3 lands inside, and the size is even
    ph = (3, 4 + ((h + 1) % 2))  # 3 + h + r must be even
    pw = (3, 4 + ((wd + 1) % 2))
    xp = jnp.pad(x, ((0, 0), ph, pw, (0, 0)))
    hp, wp = xp.shape[1], xp.shape[2]
    xs = xp.reshape(g, hp // 2, 2, wp // 2, 2, c)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(g, hp // 2, wp // 2, 4 * c)
    k2 = jnp.zeros((4, 4, 4 * c, w.shape[-1]), w.dtype)
    for ky in range(kh):
        for kx in range(kh):
            a1, b1 = ky // 2, ky % 2
            a2, b2 = kx // 2, kx % 2
            k2 = k2.at[a1, a2, (b1 * 2 + b2) * c : (b1 * 2 + b2 + 1) * c].set(
                w[ky, kx]
            )
    ho = (h + 2 * 3 - kh) // 2 + 1
    wo = (wd + 2 * 3 - kh) // 2 + 1
    y = jax.lax.conv_general_dilated(
        xs, k2.astype(jnp.bfloat16), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16,
    )[:, :ho, :wo]
    return jnp.maximum(y + b.astype(jnp.bfloat16), 0)


def _maxpool3s2_shift(x):
    """3x3/s2 pad-1 maxpool as an elementwise max of 9 strided slices —
    the layout-safe formulation when reduce_window goes pathological
    (docs/PERF.md round-2 map #4)."""
    g, h, w, c = x.shape
    ho = (h - 1) // 2 + 1
    wo = (w - 1) // 2 + 1
    xp = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)),
                 constant_values=x.dtype.type(-jnp.inf) if
                 jnp.issubdtype(x.dtype, jnp.floating) else 0)
    out = None
    for dy in range(3):
        for dx in range(3):
            s = jax.lax.slice(
                xp, (0, dy, dx, 0),
                (g, dy + 2 * ho - 1, dx + 2 * wo - 1, c), (1, 2, 2, 1),
            )
            out = s if out is None else jnp.maximum(out, s)
    return out


def _q8(x, scale: float):
    """bf16 -> int8 HBM form (fuses into the producer's epilogue)."""
    return jnp.clip(
        jnp.round(x.astype(jnp.float32) * (1.0 / scale)), -127, 127
    ).astype(jnp.int8)


def _dq(xq, scale: float):
    return xq.astype(jnp.bfloat16) * jnp.bfloat16(scale)


def _sandwich(x, scale: Optional[float]):
    if scale is None:
        return x
    return _dq(_q8(x, scale), scale)


def _cv(v, w, s, pad, groups: int = 1):
    return jax.lax.conv_general_dilated(
        v, w.astype(jnp.bfloat16), (s, s), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.bfloat16,
    )


def _conv_bottleneck(x, ws, stride: int, s_h1=None, s_h2=None, groups: int = 1):
    """One folded bottleneck, all ops as lax convs with bf16 outputs (the
    dot_general/GEMM formulation of the 1x1s measured ~2x slower: it breaks
    XLA's conv layout pipeline). Optional intra-block sandwich scales; the
    3×3 is grouped for ResNeXt trunks."""
    has_proj = len(ws) == 8
    w1, b1, w2, b2, w3, b3 = ws[:6]

    h = jnp.maximum(_cv(x, w1, 1, "VALID") + b1.astype(jnp.bfloat16), 0)
    h = _sandwich(h, s_h1)
    h = jnp.maximum(
        _cv(h, w2, stride, ((1, 1), (1, 1)), groups) + b2.astype(jnp.bfloat16),
        0,
    )
    h = _sandwich(h, s_h2)
    out = _cv(h, w3, 1, "VALID") + b3.astype(jnp.bfloat16)
    if has_proj:
        res = _cv(x, ws[6], stride, "VALID") + ws[7].astype(jnp.bfloat16)
    else:
        res = x
    return jnp.maximum(out + res, 0)


def _conv_basic(x, ws, stride: int, s_h1=None):
    """One folded BasicBlock: 3×3(s) + 3×3, residual, relu
    (reference: model/resnet.py:22-49)."""
    has_proj = len(ws) == 6
    w1, b1, w2, b2 = ws[:4]
    h = jnp.maximum(
        _cv(x, w1, stride, ((1, 1), (1, 1))) + b1.astype(jnp.bfloat16), 0
    )
    h = _sandwich(h, s_h1)
    out = _cv(h, w2, 1, ((1, 1), (1, 1))) + b2.astype(jnp.bfloat16)
    if has_proj:
        res = _cv(x, ws[4], stride, "VALID") + ws[5].astype(jnp.bfloat16)
    else:
        res = x
    return jnp.maximum(out + res, 0)


@dataclasses.dataclass
class TrunkScales:
    """Per-tensor activation scales at every sandwich point.

    block_out[si][bi], h1[si][bi], h2[si][bi] — None entries mean "no
    sandwich here" (beyond the configured depths). ``proj[si][bi]`` (only
    populated by deep calibration) is the scale of the b1 projection
    output, needed by the GEMM backend's residual fusion."""

    block_out: List[List[Optional[float]]]
    h1: List[List[Optional[float]]]
    h2: List[List[Optional[float]]]
    proj: Optional[List[List[Optional[float]]]] = None


def trunk_forward(
    trunk_tree, strides: Sequence[int], x: jnp.ndarray,
    scales: Optional[TrunkScales] = None, n_stages: Optional[int] = None,
    kind: str = "bottleneck", groups: int = 1,
) -> jnp.ndarray:
    """tiles bf16 [N, ts, ts, 3] (normalized) -> x4 feature map.

    ``n_stages`` truncates the walk (the GEMM backend consumes the stem +
    stage-0 output and runs layers 2-4 itself)."""
    stem_w, stem_b, stages = trunk_tree
    if _STEM_IMPL == "s2d":
        x = _stem_s2d(x, stem_w, stem_b)
    else:
        x = _conv_bias_relu(x, stem_w, stem_b, 2, ((3, 3), (3, 3)))
    if _POOL_IMPL == "shift":
        x = _maxpool3s2_shift(x)
    else:
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)),
        )
    if n_stages is None:
        n_stages = len(stages)
    for si, (stage, stride) in enumerate(zip(stages[:n_stages], strides)):
        for bi, bw in enumerate(stage):
            s_h1 = scales.h1[si][bi] if scales else None
            s_h2 = scales.h2[si][bi] if scales else None
            if kind == "basic":
                x = _conv_basic(
                    x, bw, stride if bi == 0 else 1, s_h1=s_h1
                )
            else:
                x = _conv_bottleneck(
                    x, bw, stride if bi == 0 else 1, s_h1=s_h1, s_h2=s_h2,
                    groups=groups,
                )
            s_out = scales.block_out[si][bi] if scales else None
            truncated_last = (
                n_stages < len(stages)
                and si == n_stages - 1
                and bi == len(stage) - 1
            )
            # the truncated walk's last output is quantized by the caller
            # (GEMM backend) instead of being sandwiched here
            if not truncated_last:
                x = _sandwich(x, s_out)
    return x


# ---------------------------------------------------------------------------
# Calibration (host CPU only — eager ops through the axon TPU tunnel are
# pathologically slow)
# ---------------------------------------------------------------------------


def _absmax_scale(x) -> float:
    # 5% headroom: a small pilot's absmax under-covers outlier images, and
    # out-of-range activations clip at ±127 and distort the top-k ranking
    s = 1.05 * float(np.abs(np.asarray(x, np.float32)).max()) / 127.0
    return s if s > 0 else 1.0


def pick_calib_images(images, n: int = 4, seed: int = 0) -> np.ndarray:
    """Seeded random calibration pilot spread across the source — a
    deterministic prefix under-represents the activation range of outlier
    images (the scales feed every int8 sandwich of the serving engine)."""
    images = np.asarray(images)
    if len(images) <= n:
        return images
    idx = np.sort(
        np.random.default_rng(seed).choice(len(images), size=n, replace=False)
    )
    return images[idx]


def calib_tiles_from_images(
    images_u8: np.ndarray, coords: np.ndarray, tile_size: int,
    n_max: int = 512, seed: int = 0,
) -> np.ndarray:
    """Host-side pilot-batch builder: slice tiles off uint8 images and apply
    the ImageNet normalization in numpy."""
    from cellsegmentation_tpu.data.batches import IMAGENET_MEAN, IMAGENET_STD

    images_u8 = np.asarray(images_u8)
    rng = np.random.default_rng(seed)
    out = []
    per_img = max(1, n_max // max(len(images_u8), 1))
    for img in images_u8:
        sel = rng.choice(
            len(coords), size=min(per_img, len(coords)), replace=False
        )
        for x0, y0 in np.asarray(coords)[sel]:
            out.append(img[x0 : x0 + tile_size, y0 : y0 + tile_size])
        if len(out) >= n_max:
            break
    tiles = np.stack(out[:n_max]).astype(np.float32) / 255.0
    return (tiles - IMAGENET_MEAN) / IMAGENET_STD


def calibrate_trunk(
    folded: FoldedTrunk, calib_tiles: np.ndarray, deep: bool = False
) -> TrunkScales:
    """Absmax activation scales at every sandwich point from a pilot batch,
    computed with an f32 numpy/CPU forward of the folded trunk.

    ``deep=True`` (GEMM backend) records h1/h2 at EVERY stage plus the b1
    projection-output scales, since the backend quantizes every inter-op
    tensor rather than only the configured sandwich depths."""
    with jax.default_device(jax.devices("cpu")[0]):
        def stem(v):
            v = _conv_bias_relu(
                v.astype(jnp.bfloat16), folded.stem_w, folded.stem_b, 2,
                ((3, 3), (3, 3)),
            )
            return jax.lax.reduce_window(
                v, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                ((0, 0), (1, 1), (1, 1), (0, 0)),
            )

        x = np.asarray(jax.jit(stem)(jnp.asarray(calib_tiles)), np.float32)

    block_out, h1s, h2s, projs = [], [], [], []
    for si, (stage, stride) in enumerate(zip(folded.stages, folded.strides)):
        bo, b1, b2, pr = [], [], [], []
        for bi, ws in enumerate(stage):
            blk_stride = stride if bi == 0 else 1
            y, h1, h2, res = _instrumented_block_np(
                x, ws, blk_stride, kind=folded.kind, groups=folded.groups
            )
            intra = deep or si < _INTRA_STAGES
            b1.append(_absmax_scale(h1) if intra else None)
            b2.append(_absmax_scale(h2) if intra else None)
            bo.append(
                _absmax_scale(y) if (deep or si < _SANDWICH_STAGES) else None
            )
            pr.append(_absmax_scale(res) if (deep and len(ws) == 8) else None)
            x = y
        block_out.append(bo)
        h1s.append(b1)
        h2s.append(b2)
        projs.append(pr)
    return TrunkScales(
        block_out=block_out, h1=h1s, h2=h2s, proj=projs if deep else None
    )


@functools.partial(jax.jit, static_argnames=("stride", "groups"))
def _np_conv3_jit(aa, kk, stride: int, groups: int):
    return jax.lax.conv_general_dilated(
        aa, kk, (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def _np_conv3(a, k, stride, groups=1):
    # module-level jit (not a per-call lambda): repeated shapes across the
    # calibration's block walk hit the in-process jit cache, and repeated
    # builds hit the persistent compilation cache — a per-call lambda
    # recompiled every conv (a measured chunk of engine-build latency)
    with jax.default_device(jax.devices("cpu")[0]):
        return np.asarray(
            _np_conv3_jit(jnp.asarray(a), jnp.asarray(k), stride, groups)
        )


def _instrumented_block_np(x, ws, stride, kind="bottleneck", groups=1):
    """f32 forward of one folded block on the host, returning
    (y, h1, h2, res) — res is the pre-add residual branch (projection
    output for b1 blocks, the identity otherwise). BasicBlocks have no h2
    activation; h1 is returned in both slots."""
    n, h, w, cin = x.shape
    flat = x.reshape(-1, cin)
    if kind == "basic":
        has_proj = len(ws) == 6
        w1, b1, w2, b2 = [np.asarray(a, np.float32) for a in ws[:4]]
        h1 = np.maximum(_np_conv3(x, w1, stride) + b1, 0.0)
        out = _np_conv3(h1, w2, 1) + b2
        ho, wo = out.shape[1], out.shape[2]
        if has_proj:
            wd = np.asarray(ws[4], np.float32)
            bd = np.asarray(ws[5], np.float32)
            xs = x[:, ::stride, ::stride, :] if stride > 1 else x
            res = xs.reshape(-1, cin) @ wd[0, 0] + bd
        else:
            res = flat
        y = np.maximum(out.reshape(-1, out.shape[-1]) + res, 0.0)
        h1f = h1.reshape(-1, h1.shape[-1])
        return y.reshape(n, ho, wo, -1), h1f, h1f, res

    has_proj = len(ws) == 8
    w1, b1, w2, b2, w3, b3 = [np.asarray(a, np.float32) for a in ws[:6]]
    h1 = np.maximum(flat @ w1[0, 0] + b1, 0.0)
    h2 = _np_conv3(h1.reshape(n, h, w, -1), w2, stride, groups)
    h2 = np.maximum(h2 + b2, 0.0)
    ho, wo = h2.shape[1], h2.shape[2]
    out = h2.reshape(-1, h2.shape[-1]) @ w3[0, 0] + b3
    if has_proj:
        wd = np.asarray(ws[6], np.float32)
        bd = np.asarray(ws[7], np.float32)
        xs = x[:, ::stride, ::stride, :] if stride > 1 else x
        res = xs.reshape(-1, cin) @ wd[0, 0] + bd
    else:
        res = flat
    y = np.maximum(out + res, 0.0).reshape(n, ho, wo, -1)
    return y, h1, h2.reshape(-1, h2.shape[-1]), res


# ---------------------------------------------------------------------------
# Engine entry point
# ---------------------------------------------------------------------------


def _head_logits(head_params, x4):
    pooled = jnp.mean(x4, axis=(1, 2)) + jnp.max(x4, axis=(1, 2))
    dense = head_params["Dense_0"]
    return (
        jax.lax.dot_general(
            pooled.astype(jnp.bfloat16), dense["kernel"].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        + dense["bias"]
    )


def _head_logits_flat(head_params, feats, px: int):
    """_head_logits on GEMM-land's [N, px*C] whole-tile layout: the avg+max
    pool runs over C-wide (128-aligned) column slices, so the [N, px*C] ->
    NHWC reshape — a real relayout copy on TPU tiled layouts — never
    materializes. Identical math (same px values pooled)."""
    c = feats.shape[1] // px
    cols = [feats[:, i * c : (i + 1) * c].astype(jnp.float32)
            for i in range(px)]
    acc_s, acc_m = cols[0], cols[0]
    for col in cols[1:]:
        acc_s = acc_s + col
        acc_m = jnp.maximum(acc_m, col)
    pooled = acc_s * (1.0 / px) + acc_m
    dense = head_params["Dense_0"]
    return (
        jax.lax.dot_general(
            pooled.astype(jnp.bfloat16), dense["kernel"].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        + dense["bias"]
    )


def make_fast_tile_logits(
    model: MILNet, variables: dict, calib_tiles: Optional[np.ndarray] = None,
    backend: str = "conv",
):
    """Build the serving fast path: (head_params, trunk_tree, tiles bf16)
    -> logits [N, 2]. Returns (fn, trunk_tree) or None when the arch isn't
    foldable. With ``calib_tiles`` (normalized f32 pilot) the trunk runs
    with calibrated int8 activation sandwiches (the q8 engine); without, it
    is the plain folded bf16 trunk.

    ``backend="gemm"`` (requires calib_tiles) replaces layers 2-4 with
    per-conv Pallas int8 GEMMs (ops/q8_trunk.py) — whole-tile GEMM 3x3s,
    residuals fused in epilogues, every inter-op tensor int8 in HBM."""
    trunk = fold_tile_trunk(model, variables)
    if trunk is None:
        # EfficientNet folds through its own MBConv walk (conv backend
        # only); any other arch falls back to the flax path (None)
        return _make_effnet_fast_logits(model, variables, calib_tiles)

    strides = tuple(trunk.strides)
    trunk_tree = jax.device_put(trunk.tree())  # one batched host->device put
    if trunk.kind != "bottleneck":
        backend = "conv"  # GEMM backend is Bottleneck-only (basic: 3x3/3x3)
    # grouped Bottlenecks (ResNeXt) enter the GEMM backend through a
    # block-diagonal kernel expansion (ops/q8_trunk.py::_expand_grouped)

    if backend == "gemm" and calib_tiles is not None:
        from cellsegmentation_tpu.ops.q8_trunk import (
            TILE_ALIGN,
            build_q8_backend,
            q8_backend_forward,
        )

        calib = np.asarray(calib_tiles, np.float32)
        scales = calibrate_trunk(trunk, calib, deep=True)
        ts = calib.shape[1]
        h_in = w_in = ts // 4  # stem s2 + maxpool s2
        qparams, qmetas = build_q8_backend(trunk, scales, h_in, w_in)
        s0 = float(scales.block_out[0][-1])
        interpret = jax.default_backend() == "cpu"
        full_tree = (trunk_tree, jax.device_put(qparams))

        hf, wf, cf = qmetas[-1].h_out, qmetas[-1].w_out, qmetas[-1].c_out

        def fast_logits_gemm(head_params, tree, x):
            conv_tree, qp = tree
            x1 = trunk_forward(
                conv_tree, strides, x, scales=scales, n_stages=1,
                kind=trunk.kind, groups=trunk.groups,
            )
            m0 = x1.shape[0]
            # conv->GEMM seam: quantize + flatten NHWC into the whole-tile
            # [N, px*C] layout (the one physical relayout of the backend)
            xq = _q8(x1, s0).reshape(m0, -1)
            pad = (-m0) % TILE_ALIGN
            if pad:
                xq = jnp.pad(xq, ((0, pad), (0, 0)))
            feats = q8_backend_forward(qp, qmetas, xq, interpret=interpret)
            return _head_logits_flat(head_params, feats, hf * wf)[:m0]

        return fast_logits_gemm, full_tree

    scales = (
        calibrate_trunk(trunk, np.asarray(calib_tiles, np.float32))
        if calib_tiles is not None
        else None
    )

    def fast_logits(head_params, trunk_tree, x):
        x4 = trunk_forward(
            trunk_tree, strides, x, scales=scales,
            kind=trunk.kind, groups=trunk.groups,
        )
        return _head_logits(head_params, x4)

    return fast_logits, trunk_tree


def _make_effnet_fast_logits(model, variables, calib_tiles):
    """EfficientNet branch of make_fast_tile_logits (ops/effnet_engine.py):
    folded MBConv trunk + int8 sandwiches on the inter-block tensors."""
    from cellsegmentation_tpu.ops.effnet_engine import (
        calibrate_effnet,
        effnet_forward,
        fold_effnet_trunk,
    )

    trunk = fold_effnet_trunk(model, variables)
    if trunk is None:
        return None
    scales = (
        calibrate_effnet(trunk, np.asarray(calib_tiles, np.float32))
        if calib_tiles is not None
        else None
    )
    metas = trunk.metas
    tree = jax.device_put(trunk.tree())  # one batched host->device put

    def fast_logits(head_params, tree, x):
        x4 = effnet_forward(tree, metas, x, scales=scales)
        return _head_logits(head_params, x4)

    return fast_logits, tree


def _layer2_mosaic_q8(patches, m0, stage_ws, stride, h1s, h2s, outs, s0, k):
    """Layer2 on a gutter-packed tile mosaic — exact per-tile semantics.

    ``patches``: int8 [M, 8, 8, C] tile patches (M may exceed m0 by row
    padding upstream; rows beyond m0 are sliced away at the end). Packs
    them into [n, k·10, k·10, C] canvases (2-px zero gutters), runs the
    folded layer2 bottlenecks as large-map XLA convs, and returns the
    whole-tile int8 seam rows [m0, 4·4·C_out] the GEMM backend consumes.

    Exactness: a per-tile 3×3 with torch's symmetric zero padding reads at
    most 1 px beyond the tile. On the mosaic that px is a gutter px, which
    is re-zeroed (mask multiply, fused into the producing conv's epilogue)
    on every tensor a 3×3 reads — the biased 1×1 outputs are nonzero in
    the gutters, so masking block outputs alone would NOT be exact. The
    1×1 convs and residual adds are pointwise and need no masking; block
    0's stride-2 projection reads only even canvas px, all content.
    Spatial layout: input pitch 10 (content [0..7]), post-stride pitch 5
    (content [0..3]) — stride-2 outputs land on the integral lattice only
    because the gutter is split (0 left, 2 right) so content starts at
    canvas px 0 of each cell.
    """
    m_all, s, _, c = patches.shape
    p, q = s + 2, (s + 2) // stride  # pitch 10 in, 5 out (stride 2)
    per = k * k
    n = -(-m_all // per)
    x = jnp.pad(patches, ((0, n * per - m_all), (0, 2), (0, 2), (0, 0)))
    x = x.reshape(n, k, k, p, p, c).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(n, k * p, k * p, c).astype(jnp.bfloat16)

    r10 = np.arange(k * p) % p < s
    mask10 = jnp.asarray(np.outer(r10, r10)[None, :, :, None], jnp.bfloat16)
    r5 = np.arange(k * q) % q < s // stride
    mask5 = jnp.asarray(np.outer(r5, r5)[None, :, :, None], jnp.bfloat16)

    for bi, bw in enumerate(stage_ws):
        if bi == 0:
            # fold the patch dequant scale s0 into c1 + proj (the same
            # fold0 trick as the per-tile plan loop: the s8->bf16 convert
            # then fuses into the conv instead of materializing)
            bw = tuple(
                (w.astype(jnp.float32) * s0).astype(jnp.bfloat16)
                if wi in (0, 6)
                else w
                for wi, w in enumerate(bw)
            )
        st = stride if bi == 0 else 1
        mask = mask10 if bi == 0 else mask5
        w1, b1, w2, b2, w3, b3 = bw[:6]
        h = jnp.maximum(_cv(x, w1, 1, "VALID") + b1.astype(jnp.bfloat16), 0)
        h = h * mask  # per-tile zero padding for the 3×3 below
        h = _sandwich(h, h1s[bi])
        h = jnp.maximum(
            _cv(h, w2, st, ((1, 1), (1, 1))) + b2.astype(jnp.bfloat16), 0
        )
        h = _sandwich(h, h2s[bi])
        out = _cv(h, w3, 1, "VALID") + b3.astype(jnp.bfloat16)
        if len(bw) == 8:
            res = _cv(x, bw[6], st, "VALID") + bw[7].astype(jnp.bfloat16)
        else:
            res = x
        x = jnp.maximum(out + res, 0)
        if bi < len(stage_ws) - 1:
            x = _sandwich(x, outs[bi])

    # quantize on the canvas (fuses into the last block's epilogue), then
    # one int8 relayout gathers content px into whole-tile seam rows
    xq = _q8(x, outs[len(stage_ws) - 1])
    so, c_out = s // stride, xq.shape[-1]
    xq = xq.reshape(n, k, q, k, q, c_out).transpose(0, 1, 3, 2, 4, 5)
    return xq[:, :, :, :so, :so, :].reshape(n * per, so * so * c_out)[:m0]


def make_dense_tile_probs(
    model: MILNet, variables: dict, tile_size: int, interval: int, hw: int,
    calib_tiles: np.ndarray, backend: str = "conv",
    gemm_first_stage: int = 2, gemm_first_block: int = 0,
):
    """Dense shared-stem sweep: (head_params, tree, images u8 [G,hw,hw,3],
    flip [G]) -> probs [G, T] in reference tile order.

    The stem + layer1 run ONCE per image (ops/dense_frontend.py — the 32/20
    grid recomputes 2.58x redundant pixels per-tile); per-tile 8x8 patches
    are gathered from the dense /4 feature map and layers 2-4 run per tile
    through the conv sandwiches (backend="conv") or the int8 GEMM trunk
    (backend="gemm", ops/q8_trunk.py). Returns None when the arch or grid
    is unsupported (caller falls back to the per-tile path).

    ``gemm_first_stage``/``gemm_first_block`` (backend="gemm" only): the
    block where GEMM-land starts; everything before it runs as XLA convs.
    Toeplitz redundancy of the whole-tile 3x3 GEMM is a per-block property
    of the input spatial size — 7x at layer2-block0's 8x8 px (measured
    4.3 ms for its c2 GEMM vs ~0.5 conv) but only 1.8x at 4x4 px. The
    default (2, 0) keeps all of layer2 conv-land and GEMMs layers 3-4;
    (1, 1) additionally moves layer2 blocks 1-3 into GEMM-land (same seam
    tensor — a 4x4x512 block output — either way); (1, 0) is the hybrid
    c1/proj conv entry.
    """
    from cellsegmentation_tpu.data.batches import normalize_images
    from cellsegmentation_tpu.ops.dense_frontend import (
        dense_grid_meta,
        frontend_patches,
        unpermute_probs,
    )

    trunk = fold_tile_trunk(model, variables)
    meta = dense_grid_meta(hw, tile_size, interval)
    if trunk is None or meta is None:
        return None
    if trunk.kind != "bottleneck" or (
        trunk.groups != 1 and not _GROUPED_GEMM
    ):
        backend = "conv"  # GEMM trunk needs Bottleneck; grouped is opt-in

    strides = tuple(trunk.strides)
    trunk_tree = jax.device_put(trunk.tree())  # one batched host->device put
    calib = np.asarray(calib_tiles, np.float32)
    deep = backend == "gemm"
    scales = calibrate_trunk(trunk, calib, deep=deep)
    s0 = float(scales.block_out[0][-1])
    n_tiles = meta.n_all * meta.n_all
    span = tile_size // 4
    interpret = jax.default_backend() == "cpu"
    # mosaic layer2 (CST_L2_MOSAIC=1): applies to the serving default
    # split only — ungrouped bottleneck, all of layer2 in conv-land, the
    # 8x8 span of the 32-px tile
    use_mosaic = (
        _L2_MOSAIC
        and backend == "gemm"
        and trunk.kind == "bottleneck"
        and trunk.groups == 1
        and gemm_first_stage == 2
        and gemm_first_block == 0
        and span == 8
        and strides[1] == 2
    )

    if deep:
        from cellsegmentation_tpu.ops.q8_trunk import (
            TILE_ALIGN,
            build_q8_backend,
            q8_backend_forward,
        )

        # conv-land halves the span at each stage's block0 (stride 2);
        # with a mid-stage split the first_stage's block0 is conv-land too
        n_halvings = (gemm_first_stage - 1) + (1 if gemm_first_block else 0)
        gspan = span
        for _ in range(n_halvings):
            gspan = (gspan + 1) // 2
        qparams, qmetas = build_q8_backend(
            trunk, scales, gspan, gspan,
            first_stage=gemm_first_stage, first_block=gemm_first_block,
        )
        hf, wf, cf = qmetas[-1].h_out, qmetas[-1].w_out, qmetas[-1].c_out
        tree = (trunk_tree, jax.device_put(qparams))
    else:
        tree = trunk_tree

    def stem0(conv_tree, u8):
        x = normalize_images(
            u8, jnp.zeros((u8.shape[0],), jnp.int32), dtype=jnp.bfloat16
        )
        x1 = trunk_forward(
            conv_tree, strides, x, scales=scales, n_stages=1,
            kind=trunk.kind, groups=trunk.groups,
        )
        return _q8(x1, s0)

    def dense_probs(head_params, tree, images, flip):
        g = images.shape[0]
        conv_tree = tree[0] if deep else tree
        patches = frontend_patches(
            meta, lambda u8: stem0(conv_tree, u8), images, flip
        )  # int8 [G*T, span, span, C]
        # pin the s8 patch tensor: without this XLA hoists the dequantize
        # into the band-assembly fusion and the 6-D canvas->row-major
        # relayout copy runs on bf16 (2x the bytes; measured 4.2 ms + a
        # separate 3.3 ms dequant pass at [192,15,15,8,8,256]); with it the
        # relayout runs on int8 (2.2 ms). A dual-alias barrier split that
        # fed c1/proj separate dequants measured WORSE (3,313 vs 3,491) —
        # XLA duplicates the dequant into two standalone passes.
        patches = jax.lax.optimization_barrier(patches)
        m0 = patches.shape[0]

        if deep and gemm_first_stage == 1 and gemm_first_block == 0:
            # hybrid conv->GEMM boundary: the first block's 1x1-reduce and
            # projection run as XLA convs on the 4-D patch tensor (conv-
            # friendly layout), so the whole-tile [N, px*C] retile happens
            # on the c_mid-wide h1 rather than the 4x-wider block input
            # (5.2 ms of copy+reshape in the first integration's profile).
            # NOTE an all-GEMM entry (c1/proj as Pallas int8 GEMMs on the
            # "bitcast" flat patches) measured WORSE (2,980 vs 3,491):
            # XLA's 2-D T(8,128) vs 4-D T(4,128) tilings make every
            # flat<->NHWC reshape a real relayout copy and the dequants
            # materialize as standalone passes.
            blk0 = conv_tree[2][1][0]
            x_bf = _dq(patches, s0)
            h1 = jnp.maximum(
                _cv(x_bf, blk0[0], 1, "VALID")
                + blk0[1].astype(jnp.bfloat16), 0
            )
            h1q = _q8(h1, scales.h1[1][0]).reshape(m0, -1)
            pr = _cv(x_bf, blk0[6], strides[1], "VALID") + blk0[7].astype(
                jnp.bfloat16
            )
            prq = _q8(pr, scales.proj[1][0]).reshape(m0, -1)
            pad = (-m0) % TILE_ALIGN
            if pad:
                h1q = jnp.pad(h1q, ((0, pad), (0, 0)))
                prq = jnp.pad(prq, ((0, pad), (0, 0)))
            feats = q8_backend_forward(
                tree[1], qmetas, None, interpret=interpret,
                first_h1=h1q, first_res=prq,
            )
            logits = _head_logits_flat(head_params, feats, hf * wf)[:m0]
        else:
            if use_mosaic:
                n_blk = len(conv_tree[2][1])
                intra = 1 < _INTRA_STAGES
                k = min(_L2_MOSAIC_K, max(1, int(np.ceil(np.sqrt(m0)))))
                xq = _layer2_mosaic_q8(
                    patches, m0, conv_tree[2][1], strides[1],
                    scales.h1[1] if intra else [None] * n_blk,
                    scales.h2[1] if intra else [None] * n_blk,
                    scales.block_out[1], s0, k,
                )
                pad = (-m0) % TILE_ALIGN
                if pad:
                    xq = jnp.pad(xq, ((0, pad), (0, 0)))
                feats = q8_backend_forward(
                    tree[1], qmetas, xq, interpret=interpret
                )
                logits = _head_logits_flat(head_params, feats, hf * wf)[:m0]
                probs = jax.nn.softmax(
                    logits.astype(jnp.float32), axis=-1
                )[:, 1]
                return unpermute_probs(meta, probs.reshape(g, n_tiles), flip)
            # feed the s8 patches to block0 with the dequant scale FOLDED
            # into its conv weights: the pure s8->bf16 convert can fuse
            # into the c1/proj conv fusions, where the explicit
            # dequant-multiply materialized as a standalone 1.4 GB bf16
            # pass (3.3 ms at [43200,8,8,256])
            x = patches.astype(jnp.bfloat16)
            fold0 = True
            if deep:
                plan = [
                    (si, bi)
                    for si in range(1, gemm_first_stage)
                    for bi in range(len(conv_tree[2][si]))
                ] + [(gemm_first_stage, bi) for bi in range(gemm_first_block)]
            else:
                plan = [
                    (si, bi)
                    for si in range(1, len(conv_tree[2]))
                    for bi in range(len(conv_tree[2][si]))
                ]
            xq = None
            for pi, (si, bi) in enumerate(plan):
                bw = conv_tree[2][si][bi]
                if fold0:
                    k = 6 if trunk.kind == "bottleneck" else 4
                    bw = tuple(
                        (w.astype(jnp.float32) * s0).astype(jnp.bfloat16)
                        if wi in (0, k)
                        else w
                        for wi, w in enumerate(bw)
                    )
                    fold0 = False
                stride_b = strides[si] if bi == 0 else 1
                # conv-land intra sandwiches stop at _INTRA_STAGES even
                # when deep calibration populated h1/h2 everywhere
                # (stage-3/4 intra sandwiches measured no gain)
                intra = si < _INTRA_STAGES
                if trunk.kind == "basic":
                    x = _conv_basic(
                        x, bw, stride_b,
                        s_h1=scales.h1[si][bi] if intra else None,
                    )
                else:
                    x = _conv_bottleneck(
                        x, bw, stride_b,
                        s_h1=scales.h1[si][bi] if intra else None,
                        s_h2=scales.h2[si][bi] if intra else None,
                        groups=trunk.groups,
                    )
                if deep and pi == len(plan) - 1:
                    # conv/GEMM split seam: quantize into the GEMM entry
                    # scale, flatten to whole-tile [N, px*C]
                    xq = _q8(x, scales.block_out[si][bi])
                else:
                    x = _sandwich(x, scales.block_out[si][bi])
            if deep:
                xq = xq.reshape(m0, -1)
                pad = (-m0) % TILE_ALIGN
                if pad:
                    xq = jnp.pad(xq, ((0, pad), (0, 0)))
                feats = q8_backend_forward(
                    tree[1], qmetas, xq, interpret=interpret
                )
                logits = _head_logits_flat(head_params, feats, hf * wf)[:m0]
            else:
                logits = _head_logits(head_params, x)[:m0]
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[:, 1]
        return unpermute_probs(meta, probs.reshape(g, n_tiles), flip)

    return dense_probs, tree
