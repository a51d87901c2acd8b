"""EfficientNet-B0/B2 encoder (NHWC, Flax).

Structure parity with the torchvision-style encoder the reference embeds
(reference: model/efficientnet.py:81-122 MBConv with SqueezeExcitation and
row-wise StochasticDepth; :392-403 stage table; width/depth multipliers B0
1.0/1.0 and B2 1.1/1.2 at :417-440). The final 1×1 conv widens to
4×last_stage channels; the MIL heads pool that map.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from cellsegmentation_tpu.core.dtypes import Policy, DEFAULT_POLICY
from cellsegmentation_tpu.models.common import conv_kaiming_init

# (expand_ratio, kernel, stride, in_ch, out_ch, num_layers) — base (B0) table.
_STAGE_TABLE = (
    (1, 3, 1, 32, 16, 1),
    (6, 3, 2, 16, 24, 2),
    (6, 5, 2, 24, 40, 2),
    (6, 3, 2, 40, 80, 3),
    (6, 5, 1, 80, 112, 3),
    (6, 5, 2, 112, 192, 4),
    (6, 3, 1, 192, 320, 1),
)


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def adjust_channels(channels: int, width_mult: float) -> int:
    return _make_divisible(channels * width_mult)


def adjust_depth(num_layers: int, depth_mult: float) -> int:
    return int(math.ceil(num_layers * depth_mult))


class _ConvNormSiLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool = True):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
            kernel_init=conv_kaiming_init,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.policy.norm_dtype, param_dtype=self.policy.param_dtype,
        )(x)
        if self.act:
            x = nn.silu(x)
        return x.astype(self.policy.compute_dtype)


class SqueezeExcitation(nn.Module):
    squeeze_channels: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        scale = jnp.mean(x, axis=(-3, -2), keepdims=True)
        scale = nn.Conv(
            self.squeeze_channels, (1, 1),
            dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
        )(scale)
        scale = nn.silu(scale)
        scale = nn.Conv(
            x.shape[-1], (1, 1),
            dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
        )(scale)
        return x * nn.sigmoid(scale)


class MBConv(nn.Module):
    expand_ratio: int
    kernel: int
    stride: int
    in_channels: int
    out_channels: int
    sd_prob: float
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool = True):
        use_res = self.stride == 1 and self.in_channels == self.out_channels
        inp = x
        expanded = adjust_channels(self.in_channels, self.expand_ratio)
        if expanded != self.in_channels:
            x = _ConvNormSiLU(expanded, kernel=1, policy=self.policy)(x, train=train)
        x = _ConvNormSiLU(
            expanded, kernel=self.kernel, stride=self.stride, groups=expanded,
            policy=self.policy,
        )(x, train=train)
        x = SqueezeExcitation(max(1, self.in_channels // 4), policy=self.policy)(x)
        x = _ConvNormSiLU(self.out_channels, kernel=1, act=False, policy=self.policy)(
            x, train=train
        )
        if use_res:
            if train and self.sd_prob > 0:
                # row-wise stochastic depth (reference: torchvision StochasticDepth "row")
                keep = 1.0 - self.sd_prob
                rng = self.make_rng("dropout")
                shape = (x.shape[0],) + (1,) * (x.ndim - 1)
                mask = jnp.floor(keep + jax.random.uniform(rng, shape))
                x = x / keep * mask.astype(x.dtype)
            x = x + inp
        return x


class EfficientNetEncoder(nn.Module):
    """Stem conv -> 7 MBConv stages -> 1×1 widening conv; emits (x4, x3, x2, x1).

    The intermediate maps exposed for the (unsupported in the reference,
    model/efficientnet.py:334-336) seg path are the outputs of the stages
    whose strides reduce to 1/4, 1/8 and 1/16 resolution.
    """

    width_mult: float = 1.0
    depth_mult: float = 1.0
    policy: Policy = DEFAULT_POLICY

    @property
    def feature_dim(self) -> int:
        return 4 * adjust_channels(_STAGE_TABLE[-1][4], self.width_mult)

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.policy.compute_dtype)
        stem_ch = adjust_channels(_STAGE_TABLE[0][3], self.width_mult)
        x = _ConvNormSiLU(stem_ch, kernel=3, stride=2, policy=self.policy)(
            x, train=train
        )

        total_blocks = sum(
            adjust_depth(n, self.depth_mult) for (_, _, _, _, _, n) in _STAGE_TABLE
        )
        block_id = 0
        skips = {}
        for stage_idx, (t, k, s, c_in, c_out, n) in enumerate(_STAGE_TABLE):
            c_in = adjust_channels(c_in, self.width_mult)
            c_out = adjust_channels(c_out, self.width_mult)
            for b in range(adjust_depth(n, self.depth_mult)):
                sd_prob = 0.2 * block_id / total_blocks
                x = MBConv(
                    expand_ratio=t,
                    kernel=k,
                    stride=s if b == 0 else 1,
                    in_channels=c_in if b == 0 else c_out,
                    out_channels=c_out,
                    sd_prob=sd_prob,
                    policy=self.policy,
                )(x, train=train)
                block_id += 1
            # capture the last map at each resolution for decoder skips
            skips[stage_idx] = x

        x = _ConvNormSiLU(self.feature_dim, kernel=1, policy=self.policy)(
            x, train=train
        )
        # stage 1 ends at 1/4 res, stage 2 at 1/8, stage 4 at 1/16, final at 1/32
        return x, skips[4], skips[2], skips[1]
