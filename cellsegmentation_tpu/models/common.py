"""Shared model building blocks: heads and the U-Net-style seg decoder.

Every MIL model carries the same four-head template
(reference: model/resnet.py:121-168):

- ``fc_tile``       : avg+max pooled feature -> Linear -> 2 logits;
- ``fc_image_cls``  : pooled -> BN -> Dropout(.25) -> ReLU -> Dense(64) -> BN
                      -> Dropout(.5) -> Dense(7);
- ``fc_image_reg``  : same MLP ending in Dense(1) + ReLU;
- ``seg_decoder``   : 8 upsample-convs with skip concats and a 2-channel 1×1 out.

EfficientNet uses simpler single-layer image heads
(reference: model/efficientnet.py:230-243).

All modules are NHWC and cast activations to the policy compute dtype; norms
run in f32.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from cellsegmentation_tpu.core.dtypes import Policy, DEFAULT_POLICY
from cellsegmentation_tpu.ops.pooling import global_avg_max_pool
from cellsegmentation_tpu.ops.resize import resize_bilinear_align_corners

conv_kaiming_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class ConvBNAct(nn.Module):
    """Conv(no bias) + BatchNorm + optional ReLU."""

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    padding: str | Sequence[tuple[int, int]] = ((1, 1), (1, 1))
    use_relu: bool = True
    policy: Policy = DEFAULT_POLICY
    feature_group_count: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            use_bias=False,
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
            kernel_init=conv_kaiming_init,
            feature_group_count=self.feature_group_count,
            name="Conv_0",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.policy.norm_dtype,
            param_dtype=self.policy.param_dtype,
        )(x)
        if self.use_relu:
            x = nn.relu(x)
        return x.astype(self.policy.compute_dtype)


class TileHead(nn.Module):
    """avg+max pool -> Dense(2) (reference: model/resnet.py:121-127, 264-269)."""

    num_classes: int = 2
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x4):
        pooled = global_avg_max_pool(x4)
        logits = nn.Dense(
            self.num_classes,
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
        )(pooled)
        return logits.astype(jnp.float32)


class ImageHeadMLP(nn.Module):
    """BN1d -> Dropout(.25) -> ReLU -> Dense(64) -> BN1d -> Dropout(.5) -> Dense(out)
    (reference: model/resnet.py:129-152). ``relu_out`` for the regression head."""

    out_features: int
    relu_out: bool = False
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, pooled, train: bool = True):
        x = pooled.astype(self.policy.norm_dtype)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.policy.norm_dtype, param_dtype=self.policy.param_dtype,
        )(x)
        x = nn.Dropout(0.25, deterministic=not train)(x)
        x = nn.relu(x)
        x = nn.Dense(
            64, dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype
        )(x.astype(self.policy.compute_dtype))
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.policy.norm_dtype, param_dtype=self.policy.param_dtype,
        )(x.astype(self.policy.norm_dtype))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Dense(
            self.out_features,
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
        )(x.astype(self.policy.compute_dtype))
        x = x.astype(jnp.float32)
        if self.relu_out:
            x = nn.relu(x)
        return x


class ImageHeadSimple(nn.Module):
    """Dropout(.3) -> Dense(out) (reference: model/efficientnet.py:230-243)."""

    out_features: int
    relu_out: bool = False
    dropout: float = 0.3
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, pooled, train: bool = True):
        x = nn.Dropout(self.dropout, deterministic=not train)(pooled)
        x = nn.Dense(
            self.out_features,
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
        )(x.astype(self.policy.compute_dtype))
        x = x.astype(jnp.float32)
        if self.relu_out:
            x = nn.relu(x)
        return x


class SegDecoder(nn.Module):
    """Expanding path: 4 bilinear (align-corners) upsamples interleaved with
    upconv pairs and skip concats, then a 2-channel 1×1 conv
    (reference: model/resnet.py:154-164, 280-303).

    Channel widths follow the reference constructor: ``base * expansion`` where
    base = (256, 256, 128, 128, 64, 64, up7, 64). The intermediate sizes are
    derived from the skip shapes instead of hard-coding 19/38/75/150/299, so
    the decoder generalizes beyond 299² inputs.
    """

    expansion: int = 1
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, feats, out_hw: tuple[int, int], train: bool = True):
        x4, x3, x2, x1 = feats
        e = self.expansion
        up7_features = 64 if e == 1 else 32 * e

        def upconv(features, x):
            return ConvBNAct(features, policy=self.policy)(x, train=train)

        x = resize_bilinear_align_corners(x4, x3.shape[-3], x3.shape[-2])
        x = upconv(256 * e, x)
        x = jnp.concatenate([x, x3.astype(x.dtype)], axis=-1)
        x = upconv(256 * e, x)

        x = resize_bilinear_align_corners(x, x2.shape[-3], x2.shape[-2])
        x = upconv(128 * e, x)
        x = jnp.concatenate([x, x2.astype(x.dtype)], axis=-1)
        x = upconv(128 * e, x)

        x = resize_bilinear_align_corners(x, x1.shape[-3], x1.shape[-2])
        x = upconv(64 * e, x)
        x = jnp.concatenate([x, x1.astype(x.dtype)], axis=-1)
        x = upconv(64 * e, x)

        x = resize_bilinear_align_corners(x, 2 * x1.shape[-3], 2 * x1.shape[-2])
        x = upconv(up7_features, x)
        x = upconv(64, x)

        x = resize_bilinear_align_corners(x, out_hw[0], out_hw[1])
        x = nn.Conv(
            2,
            (1, 1),
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
        )(x)
        return x.astype(jnp.float32)
