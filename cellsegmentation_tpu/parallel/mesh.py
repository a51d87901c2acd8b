"""Device mesh construction.

The reference has no functioning multi-device parallelism (its NCCL path is
world_size=1 dead code, reference: train_image.py:444-455). Here the
distributed story is first-class: a 2-D ``('data', 'model')`` mesh over ICI.

- ``data``  : batch (and tile-axis) sharding — the workhorse for all three
  stages; stage-2's 40k-tile batches shard naturally along it.
- ``model`` : tensor sharding of wide dense layers (the 2048→64 image heads),
  kept size 1 on small slices but wired through so larger slices can split it.

On multi-host deployments the data axis should span DCN (hosts) × ICI (local
chips); `make_mesh` builds from `jax.devices()` so that device order keeps ICI
neighbours adjacent.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def local_mesh_shape(n_devices: int) -> tuple[int, int]:
    """Pick a (data, model) shape for ``n_devices``.

    Prefers a model axis of 2 once there are ≥4 devices: the image-head dense
    layers are wide enough to split two ways, and it keeps the data axis large
    for the batch. All shapes work with axis sizes of 1.
    """
    if n_devices >= 4 and n_devices % 2 == 0:
        return (n_devices // 2, 2)
    return (n_devices, 1)


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: Optional[int] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over ``devices`` (default: all)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None and model is None:
        data, model = local_mesh_shape(n)
    elif data is None:
        data = n // model
    elif model is None:
        model = n // data
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard dim 0 (batch) over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
