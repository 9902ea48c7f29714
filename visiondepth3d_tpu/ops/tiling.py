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


def tiled_apply_batch(
    fn, imgs: jnp.ndarray, tile_hw: tuple[int, int], overlap: int
) -> jnp.ndarray:
    """Batched tiled inference: [B, H, W, C] -> [B, H, W].

    The TPU shape of the reference's per-tile Python loop
    (infer_depth_tile, render_depth.py:102-170): ALL tiles of ALL frames
    are stacked into ONE model call ([B*N, th, tw, C] — a large
    MXU-friendly batch), then Hann overlap-add recombines raw tile depths
    per frame. Static tile grid -> static shapes -> one compiled graph.
    """
    b, h, w = imgs.shape[:3]
    th, tw = tile_hw
    assert th - overlap > 0 and tw - overlap > 0, (tile_hw, overlap)
    starts = [(y, x) for y in tile_grid(h, th, overlap)
              for x in tile_grid(w, tw, overlap)]
    tiles = jnp.stack(
        [imgs[:, y : y + th, x : x + tw] for (y, x) in starts], axis=1
    )  # [B, N, th, tw, C]
    n = len(starts)
    out = fn(tiles.reshape((b * n, th, tw) + imgs.shape[3:]))
    assert out.shape[-2:] == (th, tw), (
        f"tile fn must return tile-sized depth, got {out.shape}"
    )
    out = out.reshape(b, n, th, tw)
    window = jnp.asarray(hann2d(th, tw)).astype(out.dtype)
    acc = jnp.zeros((b, h, w), out.dtype)
    wacc = jnp.zeros((h, w), out.dtype)
    for i, (y, x) in enumerate(starts):
        sl = (slice(y, y + th), slice(x, x + tw))
        acc = acc.at[(slice(None),) + sl].add(out[:, i] * window)
        wacc = wacc.at[sl].add(window)
    return acc / jnp.maximum(wacc, 1e-8)[None]
