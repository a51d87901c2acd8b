"""Shared dense stem+layer1 frontend for the stage-2 tile sweep.

The 32/20 sliding grid covers 225·32² = 230k px of each 89.4k-px image —
2.58× redundant pixel compute when every tile runs the stem independently
(reference formulation: inference.py:9-28 forwards tiles as independent
crops). Because the stem's total stride (conv1 s2 + maxpool s2 = 4)
divides the 20-px interval, the stem and layer1 can run ONCE per image
densely, with each tile's 8×8 layer1-output patch *gathered* from the
dense /4-resolution feature map.

Geometry (hw=299, ts=32, interval=20):
- interior tiles (14×14 per axis) sit at coords ≡ 0 (mod 4): gather
  their patches from a dense stem over the image cropped to 296²;
- the border-completion row/col (coord 267 ≡ 3 mod 4) comes from thin
  STRIPS (rows 263..298) whose stem phase matches the border tile, plus a
  36×36 corner patch — ~26% of one dense stem instead of a second full
  phase;
- per-tile flip augmentation (reference: dataset/dataset.py:210-211 flips
  the sliced tile) is equivalent to gathering mirrored coordinates from
  the whole-image flip; mirrored interior coords are ≡ 3 (mod 4), handled
  by shifting the dense-stem crop by bx%4 per flipped axis — pure index
  arithmetic inside the jit, no extra stem passes.

Numerics: dense features see real neighbor pixels where the per-tile
forward sees zero padding (tile borders, stem+layer1 receptive fields
only; layers 2-4 pad identically either way). This is an *approximation
of the reference formulation* gated the same way as the q8 engine: by
tile-selection agreement against the flax path (tests/test_dense_frontend.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DenseGridMeta:
    hw: int
    tile_size: int
    interval: int
    n_reg: int  # interior tiles per axis
    n_all: int  # tiles per axis incl. the border-completion one
    bx: int  # border tile coordinate (hw - tile_size)
    shift: int  # bx % 4: crop shift for flipped axes
    base: int  # dense-stem crop size (hw - shift)


def dense_grid_meta(hw: int, tile_size: int, interval: int):
    """None when the dense frontend does not apply (no 4-aligned grid)."""
    if interval % 4 or tile_size % 4:
        return None
    starts = list(range(0, hw - tile_size + 1, interval))
    bx = hw - tile_size
    if starts[-1] + tile_size == hw:
        return None  # no border-completion tile; not the LYSTO geometry
    if bx - 4 < starts[-1]:
        return None
    return DenseGridMeta(
        hw=hw, tile_size=tile_size, interval=interval,
        n_reg=len(starts), n_all=len(starts) + 1,
        bx=bx, shift=bx % 4, base=hw - (bx % 4),
    )


def apply_flips(images_u8: jnp.ndarray, flip_codes: jnp.ndarray) -> jnp.ndarray:
    """Whole-image flip by code (0 none / 1 h / 2 v / 3 both) on raw bytes."""
    do_h = ((flip_codes == 1) | (flip_codes == 3))[:, None, None, None]
    do_v = ((flip_codes == 2) | (flip_codes == 3))[:, None, None, None]
    x = jnp.where(do_h, images_u8[:, :, ::-1, :], images_u8)
    return jnp.where(do_v, x[:, ::-1, :, :], x)


def _crop(images: jnp.ndarray, x0, y0, h: int, w: int) -> jnp.ndarray:
    """Per-sample dynamic crop: [G,H,W,3] + per-sample starts -> [G,h,w,3]."""
    def one(img, a, b):
        return jax.lax.dynamic_slice(img, (a, b, 0), (h, w, img.shape[-1]))

    return jax.vmap(one)(images, x0, y0)


def _interior_axis_idx(meta: DenseGridMeta, flipped) -> jnp.ndarray:
    """Per-sample /4-feature start index of each interior tile [G, n_reg]."""
    i = jnp.arange(meta.n_reg)[None, :]
    step = meta.interval // 4
    fwd = step * i
    rev = (meta.bx - meta.shift) // 4 - step * i
    return jnp.where(flipped[:, None], rev, fwd).astype(jnp.int32)


def _expand_rows(starts: jnp.ndarray, span: int) -> jnp.ndarray:
    """[G, n] starts -> [G, n*span] of starts[i] + 0..span-1."""
    g, n = starts.shape
    return (
        starts[:, :, None] + jnp.arange(span, dtype=jnp.int32)[None, None, :]
    ).reshape(g, n * span)


def gather_patches_2d(feat, rows, cols, n_r, n_c, span):
    """[G,Hf,Wf,C] + row/col index lists -> [G, n_r, n_c, span, span, C]."""
    g, _, wf, c = feat.shape
    x = jnp.take_along_axis(feat, rows[:, :, None, None], axis=1)
    x = jnp.take_along_axis(x, cols[:, None, :, None], axis=2)
    x = x.reshape(g, n_r, span, n_c, span, c)
    return x.transpose(0, 1, 3, 2, 4, 5)


def frontend_patches(meta: DenseGridMeta, stem_fn, images_u8, flip_codes):
    """The full dense frontend: uint8 images + per-sample flip codes ->
    int8 layer1-output patches [G, n_all², span, span, C] in tile order.

    ``stem_fn(images_u8_cropped)`` must normalize + run stem/maxpool/layer1
    + quantize, returning the int8 /4-resolution feature map.
    """
    g = images_u8.shape[0]
    span = meta.tile_size // 4
    n = meta.n_reg
    fx = (flip_codes == 2) | (flip_codes == 3)  # row-axis flip
    fy = (flip_codes == 1) | (flip_codes == 3)  # col-axis flip
    imgs = apply_flips(images_u8, flip_codes)

    sx = jnp.where(fx, meta.shift, 0).astype(jnp.int32)
    sy = jnp.where(fy, meta.shift, 0).astype(jnp.int32)
    strip_x0 = jnp.where(fx, 0, meta.bx - 4).astype(jnp.int32)
    strip_y0 = jnp.where(fy, 0, meta.bx - 4).astype(jnp.int32)
    strip_h = meta.tile_size + 4
    zeros = jnp.zeros((g,), jnp.int32)

    base = _crop(imgs, sx, sy, meta.base, meta.base)
    xstrip = _crop(imgs, strip_x0, sy, strip_h, meta.base)
    ystrip = _crop(imgs, sx, strip_y0, meta.base, strip_h)
    corner = _crop(imgs, strip_x0, strip_y0, strip_h, strip_h)

    f_base = stem_fn(base)  # [G, bf, bf, C]
    f_xs = stem_fn(xstrip)  # [G, sf, bf, C]
    f_ys = stem_fn(ystrip)  # [G, bf, sf, C]
    f_cn = stem_fn(corner)  # [G, sf, sf, C]

    rx = _expand_rows(_interior_axis_idx(meta, fx), span)  # [G, n*span]
    ry = _expand_rows(_interior_axis_idx(meta, fy), span)
    # strip-local feature start of the border tile: 1 when the tile sits at
    # the strip's 4-px halo (unflipped), 0 at the image edge (flipped)
    bxs = _expand_rows(jnp.where(fx, 0, 1)[:, None].astype(jnp.int32), span)
    bys = _expand_rows(jnp.where(fy, 0, 1)[:, None].astype(jnp.int32), span)

    interior = gather_patches_2d(f_base, rx, ry, n, n, span)
    row_b = gather_patches_2d(f_xs, bxs, ry, 1, n, span)  # x = border
    col_b = gather_patches_2d(f_ys, rx, bys, n, 1, span)  # y = border
    corner_b = gather_patches_2d(f_cn, bxs, bys, 1, 1, span)

    top = jnp.concatenate([interior, col_b], axis=2)  # [G, n, n+1, ...]
    bot = jnp.concatenate([row_b, corner_b], axis=2)  # [G, 1, n+1, ...]
    allp = jnp.concatenate([top, bot], axis=1)  # [G, n+1, n+1, s, s, C]
    c = allp.shape[-1]
    return allp.reshape(g * meta.n_all * meta.n_all, span, span, c)
