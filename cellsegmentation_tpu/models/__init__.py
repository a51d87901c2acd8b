"""Model registry.

The reference eagerly instantiates all 7 pretrained models at import time
(reference: model/__init__.py:5-13) so every CLI pays the full build cost.
Here `build_model(name)` constructs lazily; the `nets` mapping keeps the
reference's key names for drop-in familiarity but resolves on access.
"""

from __future__ import annotations

from typing import Callable, Mapping

from cellsegmentation_tpu.core.dtypes import Policy, DEFAULT_POLICY
from cellsegmentation_tpu.models.milnet import (
    MILNet,
    PARTITIONS,
    ENCODER_KEY,
    TILE_KEY,
    IMAGE_CLS_KEY,
    IMAGE_REG_KEY,
    SEG_KEY,
    init_variables,
)
from cellsegmentation_tpu.models.resnet import BasicBlock, Bottleneck, ResNetEncoder
from cellsegmentation_tpu.models.efficientnet import EfficientNetEncoder

__all__ = [
    "MILNet",
    "PARTITIONS",
    "ENCODER_KEY",
    "TILE_KEY",
    "IMAGE_CLS_KEY",
    "IMAGE_REG_KEY",
    "SEG_KEY",
    "init_variables",
    "build_model",
    "nets",
    "MODEL_NAMES",
]


def _resnet(block, sizes, expansion, policy, groups=1, base_width=64):
    return MILNet(
        encoder=ResNetEncoder(
            block_cls=block,
            stage_sizes=sizes,
            policy=policy,
            groups=groups,
            base_width=base_width,
        ),
        decoder_expansion=expansion,
        image_head_style="mlp",
        supports_segment=True,
        policy=policy,
    )


def _efficientnet(width, depth, policy):
    return MILNet(
        encoder=EfficientNetEncoder(width_mult=width, depth_mult=depth, policy=policy),
        image_head_style="simple",
        supports_segment=False,  # reference parity: stages 1-2 only
        policy=policy,
    )


_BUILDERS: Mapping[str, Callable[[Policy], MILNet]] = {
    "resnet18": lambda p: _resnet(BasicBlock, (2, 2, 2, 2), 1, p),
    "resnet34": lambda p: _resnet(BasicBlock, (3, 4, 6, 3), 1, p),
    "resnet50": lambda p: _resnet(Bottleneck, (3, 4, 6, 3), 4, p),
    # NB: the reference's ResNeXt seg decoder hard-codes expansion-1 channel
    # widths that cannot consume the 4-expanded encoder maps
    # (reference: model/resnext.py:207-217 vs :353-374) — its seg mode is
    # shape-broken. We give ResNeXt the working expansion-4 decoder instead.
    "resnext50_32x4d": lambda p: _resnet(
        Bottleneck, (3, 4, 6, 3), 4, p, groups=32, base_width=4
    ),
    "resnext101_32x8d": lambda p: _resnet(
        Bottleneck, (3, 4, 23, 3), 4, p, groups=32, base_width=8
    ),
    "efficientnet_b0": lambda p: _efficientnet(1.0, 1.0, p),
    "efficientnet_b2": lambda p: _efficientnet(1.1, 1.2, p),
}

MODEL_NAMES = tuple(_BUILDERS)


def build_model(name: str, policy: Policy = DEFAULT_POLICY) -> MILNet:
    """Construct a MIL model by its reference registry name."""
    if name not in _BUILDERS:
        raise KeyError(f"unknown model {name!r}; available: {MODEL_NAMES}")
    return _BUILDERS[name](policy)


class _LazyNets(Mapping):
    """Dict-like lazy model registry keyed like the reference's ``nets``."""

    def __getitem__(self, name: str) -> MILNet:
        return build_model(name)

    def __iter__(self):
        return iter(MODEL_NAMES)

    def __len__(self):
        return len(MODEL_NAMES)


nets = _LazyNets()
