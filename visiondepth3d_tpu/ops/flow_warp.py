"""Dense 2-D backward warping (optical-flow resampling).

Generalizes the stereo stage's horizontal warp to full (u, v) flow fields —
the resampling primitive behind RIFE frame interpolation. Bilinear, border
clamp, align_corners=True pixel convention (src = dst + flow in pixels).
"""

from __future__ import annotations

import jax.numpy as jnp


def flow_warp(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """img: [H, W, C]; flow: [H, W, 2] (dx, dy) in pixels. Returns [H, W, C].

    out[y, x] = img sampled at (x + dx, y + dy), border-clamped bilinear.
    """
    h, w = img.shape[0], img.shape[1]
    yy = jnp.arange(h, dtype=flow.dtype)[:, None]
    xx = jnp.arange(w, dtype=flow.dtype)[None, :]
    src_x = jnp.clip(xx + flow[..., 0], 0.0, w - 1.0)
    src_y = jnp.clip(yy + flow[..., 1], 0.0, h - 1.0)

    x0 = jnp.clip(jnp.floor(src_x).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(src_y).astype(jnp.int32), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    fx = (src_x - x0)[..., None]
    fy = (src_y - y0)[..., None]

    flat = img.reshape(h * w, -1)

    def gather(yi, xi):
        return flat[(yi * w + xi).reshape(-1)].reshape(h, w, -1)

    top = gather(y0, x0) * (1 - fx) + gather(y0, x1) * fx
    bot = gather(y1, x0) * (1 - fx) + gather(y1, x1) * fx
    return top * (1 - fy) + bot * fy


def flow_warp_batch(imgs: jnp.ndarray, flows: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] x [B, H, W, 2] -> [B, H, W, C]."""
    import jax

    return jax.vmap(flow_warp)(imgs, flows)
