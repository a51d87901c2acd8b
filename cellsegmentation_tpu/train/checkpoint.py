"""Checkpointing with partition-filtered stage handoff.

Reference checkpoint contract (reference: train_image.py:372-386,
train_tile.py:161-176, train_seg.py:131-147): a dict of
{'mode','epoch','state_dict' (prefix-filtered), 'encoder', 'optimizer',
'scheduler'}; loading prefix-filters again and uses strict=False
(reference: train_tile.py:246-252). Our param tree is already partitioned by
those prefixes (models/milnet.py PARTITIONS), so:

- saving "pt1" keeps {encoder, fc_image_cls, fc_image_reg};
- saving "pt2" adds fc_tile; "pt3" adds seg_decoder;
- loading merges whatever partitions exist in the file into a freshly
  initialized tree (the strict=False analogue) and never fails on missing
  heads.

Serialization is flax msgpack (host arrays); schedulers are pure functions
of the step, so only the step counter is stored.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import flax.serialization
import jax
import numpy as np

from cellsegmentation_tpu.models.milnet import (
    ENCODER_KEY,
    IMAGE_CLS_KEY,
    IMAGE_REG_KEY,
    SEG_KEY,
    TILE_KEY,
)

STAGE_SAVE_PARTITIONS = {
    # reference save_model prefix filters
    "image": (ENCODER_KEY, IMAGE_CLS_KEY, IMAGE_REG_KEY),  # pt1
    "tile": (ENCODER_KEY, IMAGE_CLS_KEY, IMAGE_REG_KEY, TILE_KEY),  # pt2
    "segment": (ENCODER_KEY, IMAGE_CLS_KEY, IMAGE_REG_KEY, TILE_KEY, SEG_KEY),  # pt3
}
STAGE_PREFIX = {"image": "pt1", "tile": "pt2", "segment": "pt3"}


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(np.asarray, tree)


def _filter_partitions(tree: dict, partitions: Sequence[str]) -> dict:
    return {k: v for k, v in tree.items() if k in partitions}


def save_checkpoint(
    path_or_dir: str,
    mode: str,
    epoch: int,
    encoder: str,
    params: dict,
    batch_stats: dict,
    opt_state: Any = None,
    step: int = 0,
    extra: Optional[dict] = None,
    prefix: Optional[str] = None,
) -> str:
    """Write ``<dir>/<prefix>_<epoch>epochs.ckpt`` (or the exact path given).

    ``prefix`` defaults to the stage's ptN name; the ensemble trainer passes
    ``reg_pt1_<fold>`` (reference: train_ensemble.py save_model prefix).
    """
    parts = STAGE_SAVE_PARTITIONS[mode]
    payload = {
        "mode": mode,
        "epoch": epoch,
        "encoder": encoder,
        "step": step,
        "state_dict": {
            "params": _to_host(_filter_partitions(params, parts)),
            "batch_stats": _to_host(_filter_partitions(batch_stats, parts)),
        },
        # optax states are namedtuple trees; to_state_dict turns them into
        # plain nested dicts msgpack can carry (reference saves
        # optimizer.state_dict() the same way: train_image.py:372-386)
        "optimizer": (
            flax.serialization.to_state_dict(_to_host(opt_state))
            if opt_state is not None
            else None
        ),
        "extra": extra or {},
    }
    if os.path.isdir(path_or_dir) or not path_or_dir.endswith(".ckpt"):
        os.makedirs(path_or_dir, exist_ok=True)
        path = os.path.join(
            path_or_dir, f"{prefix or STAGE_PREFIX[mode]}_{epoch}epochs.ckpt"
        )
    else:
        path = path_or_dir
    with open(path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(payload))
    return path


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return flax.serialization.msgpack_restore(f.read())


def merge_loaded(target: dict, loaded: dict) -> dict:
    """strict=False analogue: copy loaded leaves into a (copy of) target tree
    wherever paths match; keep target values elsewhere."""

    def merge(dst: dict, src: dict) -> dict:
        out = dict(dst)
        for k, v in src.items():
            if k in out and isinstance(out[k], dict) and isinstance(v, dict):
                out[k] = merge(out[k], v)
            elif k in out:
                out[k] = v
            # keys present only in the file are dropped (strict=False)
        return out

    return merge(target, loaded)


def restore_opt_state(template_opt_state: Any, stored: Any) -> Any:
    """Rebuild a live optax state from a checkpoint's serialized optimizer.

    ``template_opt_state`` is a freshly ``tx.init``-ed state of the SAME
    optimizer config (stage mask, sgd-vs-adam); its structure receives the
    stored leaves (``ckpt["optimizer"]``; the reference restores
    optimizer.load_state_dict the same way: train_image.py:463-474). Returns
    the template unchanged when the checkpoint carries no optimizer (old
    files / cross-stage handoff).
    """
    if stored is None:
        return template_opt_state
    try:
        return flax.serialization.from_state_dict(template_opt_state, stored)
    except (KeyError, ValueError, TypeError) as e:
        # a mismatched stage mask or optimizer core (Adam vs SGD chain)
        # yields an opaque structure error from from_state_dict; resuming
        # with fresh optimizer state beats crashing, but say so loudly
        import warnings

        warnings.warn(
            "checkpoint optimizer state does not match this run's optimizer "
            f"structure (different stage or scheduler/optimizer flags?): {e}"
            " — continuing with freshly initialized optimizer state",
            stacklevel=2,
        )
        return template_opt_state


def restore_into(
    params: dict,
    batch_stats: dict,
    ckpt: dict,
    partitions: Optional[Sequence[str]] = None,
) -> tuple[dict, dict]:
    """Load a checkpoint's state_dict into fresh trees, optionally restricting
    to given partitions (the load-time prefix filter, reference:
    train_tile.py:261-268)."""
    state_dict = ckpt["state_dict"]
    loaded_params = state_dict["params"]
    loaded_stats = state_dict.get("batch_stats", {})
    if partitions is not None:
        loaded_params = _filter_partitions(loaded_params, partitions)
        loaded_stats = _filter_partitions(loaded_stats, partitions)
    return merge_loaded(params, loaded_params), merge_loaded(batch_stats, loaded_stats)
