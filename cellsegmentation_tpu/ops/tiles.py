"""Static tile grids and on-device tile extraction.

The reference slices one tile per ``__getitem__`` on the host
(reference: dataset/dataset.py:206-214) and ships 40k-tile batches through a
DataLoader. On TPU we keep whole images in HBM and materialize tiles with a
single batched gather: every LYSTO image is 299×299, so the sliding-window
grid (reference: dataset/dataset.py:718-742, border completion included) is a
*static* coordinate table shared by all images, and tile extraction becomes
``images[:, rows, cols, :]`` — XLA lowers it to vectorized dynamic-slices, no
host round trip, fully shardable along both batch and tile axes.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def _axis_coords(length: int, tile_size: int, interval: int) -> np.ndarray:
    """1-D window starts with border completion.

    Mirrors the loop structure of the reference's ``get_tiles``: regular
    starts every ``interval`` px, plus a final start flush with the border
    when the last regular window does not touch it.
    """
    starts = list(range(0, length - tile_size + 1, interval))
    if starts[-1] + tile_size != length:
        starts.append(length - tile_size)
    return np.asarray(starts, dtype=np.int32)


@functools.lru_cache(maxsize=None)
def tile_grid(height: int, width: int, tile_size: int, interval: int) -> np.ndarray:
    """Upper-left (x, y) coords of all tiles, in the reference's order.

    Order parity matters because tile indices flow into selection masks and
    pseudo-mask painting. The reference emits, for each x: all regular y's
    then the completed border y; then one completed border-x row
    (reference: dataset/dataset.py:726-741). For a uniform grid that is
    exactly the row-major product of the per-axis coordinate lists.
    Returns [T, 2] int32.
    """
    xs = _axis_coords(height, tile_size, interval)
    ys = _axis_coords(width, tile_size, interval)
    grid = np.stack(np.meshgrid(xs, ys, indexing="ij"), axis=-1).reshape(-1, 2)
    return grid.astype(np.int32)


def num_tiles(height: int, width: int, tile_size: int, interval: int) -> int:
    return tile_grid(height, width, tile_size, interval).shape[0]


def extract_tiles_factored(
    images: jnp.ndarray, xs: np.ndarray, ys: np.ndarray, tile_size: int
) -> jnp.ndarray:
    """Gather [B, nx·ny, ts, ts, C] tiles using the grid's product structure.

    The sliding grid is an outer product xs × ys, so instead of gathering
    per-tile rows (nx·ny·ts row reads, 15× redundant at 32/20) we gather the
    nx·ts unique row bands once, then the ny·ts columns: HBM traffic drops
    from O(T·ts·W) to O(nx·ts·W + T·ts²). Tile order matches ``tile_grid``
    (x outer, y inner).
    """
    b, _, w, c = images.shape
    xs = np.asarray(xs)
    ys = np.asarray(ys)
    offs = np.arange(tile_size, dtype=np.int32)
    row_idx = (xs[:, None] + offs[None, :]).reshape(-1)  # [nx*ts]
    col_idx = (ys[:, None] + offs[None, :]).reshape(-1)  # [ny*ts]
    bands = jnp.take(images, jnp.asarray(row_idx), axis=1)  # [B, nx*ts, W, C]
    tiles = jnp.take(bands, jnp.asarray(col_idx), axis=2)  # [B, nx*ts, ny*ts, C]
    tiles = tiles.reshape(b, len(xs), tile_size, len(ys), tile_size, c)
    tiles = tiles.transpose(0, 1, 3, 2, 4, 5)
    return tiles.reshape(b, len(xs) * len(ys), tile_size, tile_size, c)


def extract_tiles(images: jnp.ndarray, coords: jnp.ndarray, tile_size: int) -> jnp.ndarray:
    """Gather [B, T, ts, ts, C] tiles out of [B, H, W, C] images on device.

    When ``coords`` is the standard product grid this dispatches to the
    factored fast path; arbitrary coordinate lists fall back to the general
    two-stage gather.
    """
    try:  # traced coords (inside jit with dynamic grids) skip the fast path
        coords_np = np.asarray(coords)
    except Exception:
        coords_np = None
    if coords_np is not None:
        xs = np.unique(coords_np[:, 0])
        ys = np.unique(coords_np[:, 1])
        if len(xs) * len(ys) == len(coords_np):
            product = np.stack(
                np.meshgrid(xs, ys, indexing="ij"), axis=-1
            ).reshape(-1, 2)
            if np.array_equal(product, coords_np):
                return extract_tiles_factored(images, xs, ys, tile_size)
        coords = jnp.asarray(coords_np)
    offs = jnp.arange(tile_size, dtype=jnp.int32)
    row_idx = coords[:, 0:1] + offs[None, :]  # [T, ts]
    col_idx = coords[:, 1:2] + offs[None, :]  # [T, ts]
    # [B, H, W, C] -> [B, T, ts, W, C]
    rows = jnp.take(images, row_idx.reshape(-1), axis=1)
    rows = rows.reshape(images.shape[0], coords.shape[0], tile_size, *images.shape[2:])
    # per-tile column gather: [B, T, ts, W, C] -> [B, T, ts, ts, C]
    tiles = jnp.take_along_axis(
        rows, col_idx[None, :, None, :, None].astype(jnp.int32), axis=3
    )
    return tiles
