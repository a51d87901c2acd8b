"""Folded-BN serving trunk for the EfficientNet encoders ("q8" fast path).

Completes the per-encoder fast-path story: the ResNet/ResNeXt family folds
through ``ops/infer_engine.fold_tile_trunk``; EfficientNet's MBConv stack
(reference: model/efficientnet.py:81-122 — expand 1x1 / depthwise kxk /
SqueezeExcitation / project 1x1, stochastic depth inert at inference)
folds here. Same recipe as the ResNet engine (docs/PERF.md):

- every Conv+BN pair folded once per checkpoint (valid while the encoder
  is frozen — the whole stage-2 cycle, reference model/resnet.py:315-319);
- every conv emits bf16 (f32 outputs double HBM write traffic);
- inter-block activations crossing HBM are quantized to int8 with
  calibrated per-tensor scales and dequantized at the consumer (the
  depthwise stages are bandwidth-bound, so the 2x traffic cut is the win);
- the SqueezeExcitation gate (two 1x1 convs on the pooled vector +
  sigmoid multiply) stays bf16 — it is data-dependent and tiny.

Numerics: identical math to model.apply(..., mode="tile", train=False)
modulo bf16 rounding and +/-1 LSB int8 quantization; ranking fidelity is
gated in tests/test_infer_engine.py alongside the ResNet engines.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cellsegmentation_tpu.models.efficientnet import (
    _STAGE_TABLE,
    EfficientNetEncoder,
    adjust_channels,
    adjust_depth,
)


@dataclasses.dataclass(frozen=True)
class EffBlockMeta:
    kernel: int
    stride: int
    expanded: int  # depthwise width (= groups); == c_in when no expand conv
    use_res: bool


@dataclasses.dataclass
class EffFoldedTrunk:
    stem: tuple  # (w, b)
    blocks: List[dict]  # folded per-block weights
    metas: List[EffBlockMeta]
    widen: tuple  # final 1x1 (w, b)

    def tree(self):
        return (self.stem, self.blocks, self.widen)


def _fold(params: dict, stats: dict):
    from cellsegmentation_tpu.ops.infer_engine import fold_conv_bn

    return fold_conv_bn(
        params["Conv_0"]["kernel"],
        np.asarray(params["BatchNorm_0"]["scale"]),
        np.asarray(params["BatchNorm_0"]["bias"]),
        np.asarray(stats["BatchNorm_0"]["mean"]),
        np.asarray(stats["BatchNorm_0"]["var"]),
    )


def effnet_block_metas(width_mult: float, depth_mult: float):
    """The per-block static config, rebuilt exactly like the encoder's
    stage walk (models/efficientnet.py:163-177)."""
    metas = []
    for (t, k, s, c_in, c_out, n) in _STAGE_TABLE:
        c_in = adjust_channels(c_in, width_mult)
        c_out = adjust_channels(c_out, width_mult)
        for b in range(adjust_depth(n, depth_mult)):
            blk_in = c_in if b == 0 else c_out
            stride = s if b == 0 else 1
            metas.append(
                EffBlockMeta(
                    kernel=k,
                    stride=stride,
                    expanded=adjust_channels(blk_in, t),
                    use_res=stride == 1 and blk_in == c_out,
                )
            )
    return metas


def fold_effnet_trunk(model, variables) -> Optional[EffFoldedTrunk]:
    """None unless the MILNet encoder is an EfficientNetEncoder."""
    enc = model.encoder
    if not isinstance(enc, EfficientNetEncoder):
        return None
    # one batched device->host fetch (per-array fetches are one tunnel RPC
    # each — see ops/infer_engine.fold_tile_trunk)
    params = jax.device_get(variables["params"]["encoder"])
    stats = jax.device_get(variables["batch_stats"]["encoder"])
    metas = effnet_block_metas(enc.width_mult, enc.depth_mult)

    stem = _fold(params["_ConvNormSiLU_0"], stats["_ConvNormSiLU_0"])
    blocks = []
    for i, meta in enumerate(metas):
        bp, bs = params[f"MBConv_{i}"], stats[f"MBConv_{i}"]
        has_expand = "_ConvNormSiLU_2" in bp
        names = (
            ("_ConvNormSiLU_0", "_ConvNormSiLU_1", "_ConvNormSiLU_2")
            if has_expand
            else (None, "_ConvNormSiLU_0", "_ConvNormSiLU_1")
        )
        blk = {}
        if names[0] is not None:
            blk["expand"] = _fold(bp[names[0]], bs[names[0]])
        blk["dw"] = _fold(bp[names[1]], bs[names[1]])
        blk["proj"] = _fold(bp[names[2]], bs[names[2]])
        se = bp["SqueezeExcitation_0"]
        blk["se"] = (
            np.asarray(se["Conv_0"]["kernel"]).astype(jnp.bfloat16),
            np.asarray(se["Conv_0"]["bias"], np.float32),
            np.asarray(se["Conv_1"]["kernel"]).astype(jnp.bfloat16),
            np.asarray(se["Conv_1"]["bias"], np.float32),
        )
        blocks.append(blk)
    widen = _fold(params["_ConvNormSiLU_1"], stats["_ConvNormSiLU_1"])
    return EffFoldedTrunk(stem=stem, blocks=blocks, metas=metas, widen=widen)


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _conv(v, w, s: int, groups: int = 1, dtype=jnp.bfloat16):
    k = w.shape[0]
    pad = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        v, w.astype(dtype), (s, s), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=dtype,
    )


def effnet_forward(tree, metas, x, scales=None):
    """tiles bf16 [N, ts, ts, 3] (normalized) -> widened feature map.

    ``scales``: optional per-block-output int8 sandwich scales (list of
    float-or-None, one per block) from ``calibrate_effnet``.
    """
    from cellsegmentation_tpu.ops.infer_engine import _sandwich

    stem, blocks, widen = tree
    x = _silu(_conv(x, stem[0], 2) + stem[1].astype(jnp.bfloat16))
    for i, (blk, meta) in enumerate(zip(blocks, metas)):
        inp = x
        if "expand" in blk:
            w, b = blk["expand"]
            x = _silu(_conv(x, w, 1) + b.astype(jnp.bfloat16))
        w, b = blk["dw"]
        x = _silu(_conv(x, w, meta.stride, groups=meta.expanded)
                  + b.astype(jnp.bfloat16))
        w1, b1, w2, b2 = blk["se"]
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        gate = _silu(_conv(pooled, w1, 1) + b1.astype(jnp.bfloat16))
        gate = jax.nn.sigmoid(_conv(gate, w2, 1) + b2.astype(jnp.bfloat16))
        x = x * gate
        w, b = blk["proj"]
        x = _conv(x, w, 1) + b.astype(jnp.bfloat16)
        if meta.use_res:
            x = x + inp
        x = _sandwich(x, scales[i] if scales else None)
    return _silu(_conv(x, widen[0], 1) + widen[1].astype(jnp.bfloat16))


def calibrate_effnet(trunk: EffFoldedTrunk, calib_tiles: np.ndarray):
    """Absmax int8 scales for every block-output tensor from a pilot batch
    (f32 host forward — eager TPU ops are pathologically slow here)."""
    from cellsegmentation_tpu.ops.infer_engine import _absmax_scale

    f32 = jnp.float32
    with jax.default_device(jax.devices("cpu")[0]):
        def stem_fwd(v):
            return _silu(_conv(v, trunk.stem[0], 2, dtype=f32)
                         + trunk.stem[1])

        x = np.asarray(jax.jit(stem_fwd)(jnp.asarray(calib_tiles, f32)),
                       np.float32)
        scales = []
        for blk, meta in zip(trunk.blocks, trunk.metas):
            def block_fwd(v, blk=blk, meta=meta):
                inp = v
                y = v
                if "expand" in blk:
                    w, b = blk["expand"]
                    y = _silu(_conv(y, w, 1, dtype=f32) + b)
                w, b = blk["dw"]
                y = _silu(
                    _conv(y, w, meta.stride, groups=meta.expanded,
                          dtype=f32) + b
                )
                w1, b1, w2, b2 = blk["se"]
                pooled = jnp.mean(y, axis=(1, 2), keepdims=True)
                gate = _silu(_conv(pooled, w1, 1, dtype=f32) + b1)
                gate = jax.nn.sigmoid(_conv(gate, w2, 1, dtype=f32) + b2)
                y = y * gate
                w, b = blk["proj"]
                y = _conv(y, w, 1, dtype=f32) + b
                if meta.use_res:
                    y = y + inp
                return y

            x = np.asarray(jax.jit(block_fwd)(jnp.asarray(x)), np.float32)
            scales.append(_absmax_scale(x))
    return scales
