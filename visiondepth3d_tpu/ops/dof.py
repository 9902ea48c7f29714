"""Depth-of-field via a Gaussian level-of-detail stack + per-pixel lerp.

Behavioral spec: ``apply_dof_cuda`` (render_3d.py:769-834). Five blur levels
with sigma in linspace(0, max_sigma, 5), kernel size 2*ceil(2*sigma)+1; the
per-pixel blur index is |depth - focal| / focus_width clamped to [0, 1],
scaled to [0, N-1], and the two neighboring levels are lerped.

On TPU the level stack is N-1 separable convolutions (static kernels) and
the gather over levels becomes a weighted sum of the stacked levels — a
select-free formulation XLA turns into fused multiply-adds.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from .filters import gaussian_blur


def apply_dof(
    rgb: jnp.ndarray,
    depth: jnp.ndarray,
    focal_depth,
    max_sigma=2.0,
    focus_width: float = 0.35,
    num_levels: int = 5,
) -> jnp.ndarray:
    """rgb: [H, W, 3]; depth: [H, W]; focal_depth: scalar. Returns [H, W, 3].

    ``max_sigma`` must be a static Python float (the blur kernel sizes depend
    on it); ``focal_depth`` may be traced.
    """
    max_sigma = float(max_sigma)
    n = num_levels
    depth_diff = jnp.abs(depth - focal_depth)
    blur_weights = jnp.clip(depth_diff / (focus_width + 1e-6), 0.0, 1.0)

    levels = [max_sigma * i / (n - 1) for i in range(n)]
    stack = []
    for sigma in levels:
        if sigma == 0.0:
            stack.append(rgb)
        else:
            ksize = int(2 * math.ceil(2 * sigma) + 1)
            stack.append(gaussian_blur(rgb, ksize, sigma))

    blur_idx = jnp.clip(blur_weights * (n - 1), 0.0, n - 1 - 1e-6)
    lower_idx = jnp.clip(jnp.floor(blur_idx), 0, n - 2)
    # level weights in the image dtype (dtype-preserving for bf16 frames)
    alpha = (blur_idx - lower_idx)[..., None].astype(rgb.dtype)
    lower_idx = lower_idx.astype(rgb.dtype)

    # Select the two adjacent levels without a gather: sum over levels with
    # indicator weights (n is tiny, so this is n fused FMAs per pixel).
    out = jnp.zeros_like(rgb)
    for i, img in enumerate(stack):
        w_lo = (lower_idx == i).astype(rgb.dtype)[..., None] * (1.0 - alpha)
        w_hi = (lower_idx == i - 1).astype(rgb.dtype)[..., None] * alpha
        out = out + img * (w_lo + w_hi)
    return jnp.clip(out, 0.0, 1.0)
