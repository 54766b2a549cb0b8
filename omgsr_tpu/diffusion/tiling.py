"""Tiled-latent aggregation math: grid placement + gaussian stitch weights.

The reference processes large latents as overlapping tiles through the
denoiser and blends predictions with a gaussian weight map
(infer/omgsr_s_infer_model.py:56-71, :88-168). This module provides the
static (trace-time) grid computation and the weight map; the actual batched
tile loop lives in omgsr_tpu.inference.tiled where it is vmapped/scanned
inside one jit (unlike the reference, whose tile batching degenerates to one
tile per denoiser call, infer/omgsr_s_infer_model.py:129).
"""

from __future__ import annotations

import numpy as np


def gaussian_tile_weights(tile_h: int, tile_w: int, var: float = 0.01) -> np.ndarray:
    """(tile_h, tile_w) gaussian blending weights.

    Exactly reproduces the reference's _gaussian_weights
    (infer/omgsr_s_infer_model.py:56-71) including its asymmetric midpoints:
    x uses (w-1)/2 while y uses h/2, with variance normalized by the tile
    size. Reproduced verbatim because stitch weights directly shape the
    output pixels (the <=1e-3 deviation target).
    """
    midpoint_x = (tile_w - 1) / 2
    x = np.arange(tile_w, dtype=np.float64)
    x_probs = np.exp(-((x - midpoint_x) ** 2) / (tile_w * tile_w) / (2 * var)) / np.sqrt(
        2 * np.pi * var
    )
    midpoint_y = tile_h / 2
    y = np.arange(tile_h, dtype=np.float64)
    y_probs = np.exp(-((y - midpoint_y) ** 2) / (tile_h * tile_h) / (2 * var)) / np.sqrt(
        2 * np.pi * var
    )
    return np.outer(y_probs, x_probs)


def tile_grid_1d(size: int, tile: int, overlap: int) -> list[int]:
    """Start offsets of tiles along one dim, stride (tile-overlap), last tile
    snapped to the end so every pixel is covered.

    Matches the reference's grid construction + edge clamp
    (infer/omgsr_s_infer_model.py:94-123): offsets are i*(tile-overlap) and
    the final tile starts at size-tile.
    """
    if tile >= size:
        return [0]
    if overlap >= tile:
        raise ValueError(f"tile_overlap {overlap} must be < tile {tile}")
    stride = tile - overlap
    # number of tiles: smallest n with (n-1)*stride + tile >= size
    n = 1
    while (n - 1) * stride + tile < size:
        n += 1
    offs = [min(i * stride, size - tile) for i in range(n)]
    return offs


def tile_grid_2d(h: int, w: int, tile: int, overlap: int) -> list[tuple[int, int]]:
    """Row-major (y, x) tile offsets covering an h x w latent."""
    ys = tile_grid_1d(h, tile, overlap)
    xs = tile_grid_1d(w, tile, overlap)
    return [(y, x) for y in ys for x in xs]
