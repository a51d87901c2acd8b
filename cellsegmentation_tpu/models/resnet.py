"""ResNet / ResNeXt encoders (NHWC, Flax).

Geometry parity with the reference (reference: model/resnet.py:111-118,
236-243): 299×299 input -> conv1(7×7,s2,p3) 150 -> maxpool(3×3,s2,p1) 75 ->
layer1 75 -> layer2 38 -> layer3 19 -> layer4 10; a 32×32 tile ->
16/8/8/4/2/1. ResNeXt is the same skeleton with grouped 3×3 bottleneck convs
(reference: model/resnext.py:160-171, groups/width at :418-442).

Returns the four feature maps (x4, x3, x2, x1) needed by the seg decoder.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn

from cellsegmentation_tpu.core.dtypes import Policy, DEFAULT_POLICY
from cellsegmentation_tpu.models.common import ConvBNAct, conv_kaiming_init


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    policy: Policy = DEFAULT_POLICY
    groups: int = 1
    base_width: int = 64

    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        residual = x
        out = ConvBNAct(
            self.planes, strides=(self.stride, self.stride), policy=self.policy
        )(x, train=train)
        out = ConvBNAct(self.planes, use_relu=False, policy=self.policy)(
            out, train=train
        )
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = ConvBNAct(
                self.planes,
                kernel_size=(1, 1),
                strides=(self.stride, self.stride),
                padding="VALID",
                use_relu=False,
                policy=self.policy,
            )(x, train=train)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """1×1 reduce -> 3×3 (grouped for ResNeXt) -> 1×1 expand ×4."""

    planes: int
    stride: int = 1
    policy: Policy = DEFAULT_POLICY
    groups: int = 1
    base_width: int = 64

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = True):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_ch = self.planes * self.expansion
        residual = x
        out = ConvBNAct(
            width, kernel_size=(1, 1), padding="VALID", policy=self.policy
        )(x, train=train)
        out = ConvBNAct(
            width,
            strides=(self.stride, self.stride),
            policy=self.policy,
            feature_group_count=self.groups,
        )(out, train=train)
        out = ConvBNAct(
            out_ch, kernel_size=(1, 1), padding="VALID", use_relu=False,
            policy=self.policy,
        )(out, train=train)
        if self.stride != 1 or x.shape[-1] != out_ch:
            residual = ConvBNAct(
                out_ch,
                kernel_size=(1, 1),
                strides=(self.stride, self.stride),
                padding="VALID",
                use_relu=False,
                policy=self.policy,
            )(x, train=train)
        return nn.relu(out + residual)


class ResNetEncoder(nn.Module):
    """Stem + 4 stages; emits (x4, x3, x2, x1)."""

    block_cls: type
    stage_sizes: Sequence[int]
    policy: Policy = DEFAULT_POLICY
    groups: int = 1
    base_width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.policy.compute_dtype)
        x = nn.Conv(
            64,
            (7, 7),
            strides=(2, 2),
            padding=((3, 3), (3, 3)),
            use_bias=False,
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
            kernel_init=conv_kaiming_init,
            name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.policy.norm_dtype, param_dtype=self.policy.param_dtype,
            name="bn1",
        )(x)
        x = nn.relu(x).astype(self.policy.compute_dtype)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = []
        for stage, (planes, blocks) in enumerate(
            zip((64, 128, 256, 512), self.stage_sizes)
        ):
            for b in range(blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = self.block_cls(
                    planes=planes,
                    stride=stride,
                    policy=self.policy,
                    groups=self.groups,
                    base_width=self.base_width,
                    name=f"layer{stage + 1}_{b}",
                )(x, train=train)
            feats.append(x)

        x1, x2, x3, x4 = feats
        return x4, x3, x2, x1
