"""Sharding rules for parameter trees and host→device batch transfer.

Replaces the reference's (dead) DistributedDataParallel/DistributedSampler
path (reference: train_image.py:432-455) with explicit GSPMD shardings:
batches are split over the ``data`` axis, and wide dense kernels are split
over the ``model`` axis. XLA inserts the psum/all-gather collectives.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cellsegmentation_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# Dense kernels at least this wide on the input dim are sharded over 'model'.
_MIN_TP_FAN_IN = 512


def _spec_for(path: tuple, leaf: Any, model_size: int) -> P:
    """Tensor-parallel rule: split wide dense kernels column-wise.

    A flax Dense kernel is [fan_in, fan_out]. The image heads contract a
    2048-wide pooled feature into 64 units (reference: model/resnet.py:129-152)
    — that fan_in dimension is the natural TP split: each shard computes a
    partial matmul and XLA inserts the psum.
    """
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    is_kernel = names and names[-1] == "kernel"
    if (
        model_size > 1
        and is_kernel
        and hasattr(leaf, "ndim")
        and leaf.ndim == 2
        and leaf.shape[0] >= _MIN_TP_FAN_IN
        and leaf.shape[0] % model_size == 0
    ):
        return P(MODEL_AXIS, None)
    return P()


def infer_param_shardings(tree: Any, mesh: Mesh) -> Any:
    """Per-leaf NamedShardings: wide dense kernels over 'model', rest replicated."""
    model_size = mesh.shape[MODEL_AXIS]

    def leaf_sharding(path, leaf):
        return NamedSharding(mesh, _spec_for(path, leaf, model_size))

    return jax.tree_util.tree_map_with_path(leaf_sharding, tree)


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a host batch with dim 0 sharded over the data axis.

    Single-process: ``batch`` is the global batch. Multi-host SPMD: every
    process passes its process-LOCAL rows (from a process-sharded
    BatchIterator) and the global array is assembled across hosts — the
    DistributedSampler replacement (reference: train_image.py:432-439).
    """
    multihost = jax.process_count() > 1

    def put(x):
        x = np.asarray(x)
        spec = P(DATA_AXIS, *([None] * (x.ndim - 1))) if x.ndim >= 1 else P()
        sharding = NamedSharding(mesh, spec)
        if multihost and x.ndim >= 1:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate_tree(mesh: Mesh, tree: Any) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
