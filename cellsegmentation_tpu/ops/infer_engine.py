"""Folded-BN inference engine for the stage-2 tile hot loop.

Production-serving path for the ResNet-family tile classifier: BatchNorm is
folded into conv weights/biases once per checkpoint (the encoder is frozen
during stage 2, reference: model/resnet.py:315-319, so folding stays valid
across the whole inference→select→train cycle), the trunk runs as pure
lax/Pallas ops — the stride-1 bottleneck chains go through the VMEM-resident
Pallas kernel (ops/pallas_bottleneck.py) — and only the tile-head dense
weights are read per call.

Numerics: identical math to model.apply(..., mode="tile", train=False)
modulo bf16 rounding of the folded scales (validated in
tests/test_infer_engine.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cellsegmentation_tpu.models.milnet import MILNet
from cellsegmentation_tpu.models.resnet import Bottleneck, ResNetEncoder
from cellsegmentation_tpu.ops.pallas_bottleneck import fused_bottleneck_chain


def fold_conv_bn(kernel, scale, bias, mean, var, eps: float = 1e-5):
    """conv(x, w) -> BN  ≡  conv(x, w·g) + (b - m·g), g = γ/√(σ²+ε)."""
    g = scale / np.sqrt(var + eps)
    w = (np.asarray(kernel) * g).astype(np.float32)
    b = (bias - mean * g).astype(np.float32)
    return jnp.asarray(w, jnp.bfloat16), jnp.asarray(b, jnp.float32)


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
    """Folded weights, grouped per stage: [(block0 weights), (block1), ...]."""

    stem_w: jnp.ndarray
    stem_b: jnp.ndarray
    stages: list  # list of stages; each stage = list of block weight tuples
    strides: list  # per-stage stride of block 0

    def tree(self):
        return (self.stem_w, self.stem_b, self.stages)


def fold_tile_trunk(model: MILNet, variables: dict) -> Optional[FoldedTrunk]:
    """Fold a ResNet-family MILNet encoder; None if the arch is unsupported
    (grouped/ResNeXt and EfficientNet fall back to the flax path)."""
    enc = model.encoder
    if not isinstance(enc, ResNetEncoder):
        return None
    if enc.groups != 1 or enc.block_cls is not Bottleneck:
        return None  # BasicBlock/grouped support can be added; gate for now

    params = variables["params"]["encoder"]
    stats = variables["batch_stats"]["encoder"]
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
            # ConvBNAct_0/1/2 = 1×1 reduce / 3×3 / 1×1 expand; _3 = projection
            for ci in range(3):
                w, bias = _fold_cba(bp[f"ConvBNAct_{ci}"], bs[f"ConvBNAct_{ci}"])
                if ci != 1:
                    w = w[0, 0]  # 1×1 kernels as plain GEMM matrices
                ws.extend([w, bias])
            if f"ConvBNAct_3" in bp:
                wd, bd = _fold_cba(bp["ConvBNAct_3"], bs["ConvBNAct_3"])
                ws.extend([wd[0, 0], bd])
            stage.append(tuple(ws))
        stages.append(stage)
        strides.append(1 if s == 0 else 2)
    return FoldedTrunk(stem_w=stem_w, stem_b=stem_b, stages=stages, strides=strides)


def _conv_bias_relu(x, w, b, stride: int, padding):
    y = jax.lax.conv_general_dilated(
        x, w.astype(jnp.bfloat16), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return jnp.maximum(y + b, 0.0).astype(jnp.bfloat16)


def _plain_bottleneck(x, ws, stride: int):
    """Reference lax implementation of one block (used for stride-2 block 0)."""
    has_proj = len(ws) == 8
    if has_proj:
        w1, b1, w2, b2, w3, b3, wd, bd = ws
    else:
        w1, b1, w2, b2, w3, b3 = ws
    n, h, wdt, cin = x.shape
    flat = x.reshape(-1, cin)
    hid = jnp.maximum(
        jax.lax.dot_general(flat, w1, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + b1, 0.0
    ).astype(jnp.bfloat16).reshape(n, h, wdt, -1)
    hid2 = _conv_bias_relu(hid, w2, b2, stride, ((1, 1), (1, 1)))
    out = jax.lax.dot_general(
        hid2.reshape(-1, hid2.shape[-1]), w3, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b3
    if has_proj:
        xs = x[:, ::stride, ::stride, :] if stride > 1 else x
        res = jax.lax.dot_general(
            xs.reshape(-1, cin), wd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bd
    else:
        res = flat.astype(jnp.float32)
    y = jnp.maximum(out + res, 0.0).astype(jnp.bfloat16)
    return y.reshape(n, hid2.shape[1], hid2.shape[2], -1)


# Chains whose total folded weight bytes exceed this skip the Pallas kernel:
# weights live in VMEM for the whole chain, and past ~6 MB they crowd out
# the activation scratch (layers 3-4 run near-peak under plain XLA anyway —
# the kernel's win is the bandwidth-bound layers 1-2).
_MAX_CHAIN_WEIGHT_BYTES = 6 * 1024 * 1024


def trunk_forward(
    trunk_tree, strides: Sequence[int], x: jnp.ndarray, use_pallas: bool = True
) -> jnp.ndarray:
    """tiles bf16 [N, ts, ts, 3] (normalized) -> x4 feature map."""
    stem_w, stem_b, stages = trunk_tree
    if jax.default_backend() not in ("tpu", "axon"):
        use_pallas = False  # the Mosaic kernel only exists on TPU backends
    x = _conv_bias_relu(x, stem_w, stem_b, 2, ((3, 3), (3, 3)))
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    for stage, stride in zip(stages, strides):
        blocks = list(stage)
        if stride > 1:
            x = _plain_bottleneck(x, blocks[0], stride)
            blocks = blocks[1:]
        if not blocks:
            continue
        chain_bytes = sum(
            int(np.prod(a.shape)) * a.dtype.itemsize for bw in blocks for a in bw
        )
        n = x.shape[0]
        bt = _pick_bt(x)
        if (
            use_pallas
            and chain_bytes <= _MAX_CHAIN_WEIGHT_BYTES
            and x.shape[1] <= 8
            and bt is not None
        ):
            x = fused_bottleneck_chain(x, blocks, block_tiles=bt)
        else:
            for bw in blocks:
                x = _plain_bottleneck(x, bw, 1)
    return x


def _pick_bt(x) -> Optional[int]:
    """Chunk size: the largest divisor of N whose activation footprint stays
    well under VMEM (None -> no valid chunking, use the lax fallback)."""
    px = x.shape[1] * x.shape[2]
    cap = 32 if px >= 64 else (32 if px >= 16 else 128)
    n = x.shape[0]
    for bt in (cap, cap // 2, cap // 4, 32, 16):
        if bt and n % bt == 0:
            return bt
    return None


def make_fast_tile_logits(model: MILNet, variables: dict):
    """Returns fast_logits(head_params, tiles_bf16) -> [N, 2] plus the folded
    trunk pytree, or None when the arch isn't foldable."""
    trunk = fold_tile_trunk(model, variables)
    if trunk is None:
        return None

    strides = tuple(trunk.strides)
    trunk_tree = trunk.tree()

    def fast_logits(head_params, trunk_tree, x):
        x4 = trunk_forward(trunk_tree, strides, x)
        pooled = jnp.mean(x4, axis=(1, 2)) + jnp.max(x4, axis=(1, 2))
        dense = head_params["Dense_0"]
        logits = (
            jax.lax.dot_general(
                pooled.astype(jnp.bfloat16), dense["kernel"].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            + dense["bias"]
        )
        return logits

    return fast_logits, trunk_tree
