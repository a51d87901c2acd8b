"""Config handling.

The reference keeps a 2-line ``config.ini`` with ``[data] data_path``
(reference: config.ini:1-2, read by every CLI e.g. train_image.py:421-423).
We keep that file format for drop-in parity and add typed per-stage dataclasses
used by the CLIs.
"""

from __future__ import annotations

import configparser
import dataclasses
import os
from typing import Optional


def load_data_path(ini_path: str = "config.ini", default: str = "./data") -> str:
    """Read ``[data] data_path`` from an ini file; fall back to ``default``."""
    if os.path.exists(ini_path):
        parser = configparser.ConfigParser()
        parser.read(ini_path)
        if parser.has_option("data", "data_path"):
            return parser.get("data", "data_path")
    return default


@dataclasses.dataclass
class StageConfig:
    """Options shared by all training stages (reference CLI flags, SURVEY §2.6)."""

    encoder: str = "resnet50"
    epochs: int = 50
    batch_size: int = 48
    lr: float = 5e-4
    weight_decay: float = 1e-4
    scheduler: Optional[str] = None  # None | OneCycleLR | ExponentialLR | CosineAnnealingWarmRestarts
    augment: bool = False
    kfold: int = 10
    num_of_imgs: int = 0  # debug truncation; 0 = all
    test_every: int = 1
    seed: int = 42
    output: str = "./output"
    device_count: Optional[int] = None  # None = use every visible device


@dataclasses.dataclass
class TileStageConfig(StageConfig):
    """Stage-2 options (reference: train_tile.py:28-68)."""

    epochs: int = 30
    tile_batch_size: int = 40960
    tile_size: int = 32
    interval: int = 20
    tiles_per_pos: int = 1
    topk_neg: int = 30
    pos_neg_ratio: float = 0.5
    threshold: float = 0.95


@dataclasses.dataclass
class SegStageConfig(StageConfig):
    """Stage-3 options (reference: train_seg.py:28-70)."""

    epochs: int = 30
    batch_size: int = 32
    tile_size: int = 16
    interval: int = 5
    threshold: float = 0.95
    preprocess: bool = False
