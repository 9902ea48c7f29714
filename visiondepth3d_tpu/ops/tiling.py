"""Hann-blended spatial tiling for high-resolution model inference.

The reference's tiled depth path (infer_depth_tile, render_depth.py:102-170)
splits a frame into overlapping tiles, runs the model per tile, and
accumulates with a 2-D Hann window; ESRGAN has a simpler overlap tiler
(merged_pipeline.py:269-284). TPU version: the tile grid is STATIC, tiles
are stacked into one batch (one big MXU-friendly model call instead of a
Python loop), and the weighted accumulation is a scatter-free overlap-add.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def hann2d(th: int, tw: int, eps: float = 1e-3) -> np.ndarray:
    """Separable 2-D Hann window, floored at eps (render_depth.py:62-66)."""
    wy = 0.5 - 0.5 * np.cos(2 * np.pi * (np.arange(th) + 0.5) / th)
    wx = 0.5 - 0.5 * np.cos(2 * np.pi * (np.arange(tw) + 0.5) / tw)
    return np.maximum(np.outer(wy, wx), eps).astype(np.float32)


def tile_grid(size: int, tile: int, overlap: int) -> list[int]:
    """Static tile start offsets covering [0, size) with the given overlap."""
    if size <= tile:
        return [0]
    step = tile - overlap
    starts = list(range(0, size - tile, step))
    starts.append(size - tile)
    return starts


def extract_tiles(img: jnp.ndarray, tile_hw: tuple[int, int], overlap: int):
    """[H, W, C] -> ([N, th, tw, C], starts) with static offsets."""
    th, tw = tile_hw
    ys = tile_grid(img.shape[0], th, overlap)
    xs = tile_grid(img.shape[1], tw, overlap)
    tiles = [img[y : y + th, x : x + tw] for y in ys for x in xs]
    starts = [(y, x) for y in ys for x in xs]
    return jnp.stack(tiles), starts


def blend_tiles(
    tiles: jnp.ndarray, starts, out_hw: tuple[int, int]
) -> jnp.ndarray:
    """Hann-weighted overlap-add of [N, th, tw(, C)] tiles back to out_hw."""
    th, tw = tiles.shape[1], tiles.shape[2]
    window = jnp.asarray(hann2d(th, tw))
    if tiles.ndim == 4:
        window = window[..., None]
        acc = jnp.zeros(out_hw + (tiles.shape[-1],), tiles.dtype)
        wacc = jnp.zeros(out_hw + (1,), tiles.dtype)
    else:
        acc = jnp.zeros(out_hw, tiles.dtype)
        wacc = jnp.zeros(out_hw, tiles.dtype)
    for i, (y, x) in enumerate(starts):
        sl = (slice(y, y + th), slice(x, x + tw))
        acc = acc.at[sl].add(tiles[i] * window)
        wacc = wacc.at[sl].add(window)
    return acc / jnp.maximum(wacc, 1e-8)


def tiled_apply(fn, img: jnp.ndarray, tile_hw: tuple[int, int], overlap: int):
    """Run ``fn`` ([N, th, tw, C] -> [N, th, tw] or [N, th, tw, C']) over
    Hann-blended tiles of one image. fn sees ONE batched call."""
    tiles, starts = extract_tiles(img, tile_hw, overlap)
    out_tiles = fn(tiles)
    return blend_tiles(out_tiles, starts, img.shape[:2])
