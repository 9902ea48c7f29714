"""Horizontal disparity warp — the DIBR resampling core.

The reference warps with ``F.grid_sample(mode='bilinear',
padding_mode='border', align_corners=True)`` on a base grid whose x
coordinates are shifted by the normalized disparity map
(render_3d.py:684-701). Because only x moves, the general 2-D grid_sample
collapses to a per-row 1-D bilinear gather:

    src_x = x + shift[y, x] * (W - 1) / 2        (align_corners=True mapping)
    out[y, x] = lerp(src[y, floor(src_x)], src[y, floor(src_x)+1])

with src_x clamped to [0, W-1] (border padding). The left eye adds the shift
to the sampling grid, the right eye subtracts it — matching
``grid_left[..., 0] += shift`` / ``grid_right[..., 0] -= shift``.

This module is the pure-jnp implementation (gather based); see
``ops.pallas_warp`` for the fused Pallas kernel used on the hot path.
"""

from __future__ import annotations

import jax.numpy as jnp


def _sample_row_bilinear(img: jnp.ndarray, src_x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample along W with border clamp.

    img: [H, W] or [H, W, C]; src_x: [H, W] float source columns.
    """
    w = img.shape[1]
    src_x = jnp.clip(src_x, 0.0, w - 1.0)
    x0 = jnp.floor(src_x).astype(jnp.int32)
    x0 = jnp.clip(x0, 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    frac = src_x - x0.astype(src_x.dtype)
    if img.ndim == 3:
        frac = frac[..., None]
        g0 = jnp.take_along_axis(img, x0[..., None], axis=1)
        g1 = jnp.take_along_axis(img, x1[..., None], axis=1)
    else:
        g0 = jnp.take_along_axis(img, x0, axis=1)
        g1 = jnp.take_along_axis(img, x1, axis=1)
    return g0 * (1.0 - frac) + g1 * frac


def disparity_warp(img: jnp.ndarray, shift_norm: jnp.ndarray) -> jnp.ndarray:
    """Warp img by a normalized shift map (grid units, [-1, 1] spans width).

    img: [H, W] or [H, W, C]; shift_norm: [H, W]. A positive shift samples
    from the right (grid.x += shift semantics).
    """
    h, w = img.shape[0], img.shape[1]
    x_idx = jnp.arange(w, dtype=shift_norm.dtype)[None, :]
    src_x = x_idx + shift_norm * (w - 1) / 2.0
    return _sample_row_bilinear(img, src_x)


def stereo_warp(
    frame: jnp.ndarray, shaped_depth: jnp.ndarray, shift_norm: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Warp frame and shaped depth for both eyes in one call.

    Returns (left, right, depth_left, depth_right) — the four grid_sample
    calls of render_3d.py:697-701 expressed as two fused dual-gathers.
    """
    h, w = frame.shape[0], frame.shape[1]
    x_idx = jnp.arange(w, dtype=shift_norm.dtype)[None, :]
    delta = shift_norm * (w - 1) / 2.0
    src_left = x_idx + delta
    src_right = x_idx - delta
    left = _sample_row_bilinear(frame, src_left)
    right = _sample_row_bilinear(frame, src_right)
    depth_left = _sample_row_bilinear(shaped_depth, src_left)
    depth_right = _sample_row_bilinear(shaped_depth, src_right)
    return left, right, depth_left, depth_right
