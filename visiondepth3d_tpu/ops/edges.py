"""Edge-aware artifact control: shift suppression, feathering, healing.

Behavioral spec from the reference:
- ``suppress_artifacts_with_edge_mask`` (render_3d.py:198-216): depth-gradient
  sigmoid mask, inverted, 5x5 box-smoothed, multiplies the shift map. Note the
  reference takes abs() of each padded forward difference before the sqrt.
- ``feather_shift_edges`` (render_3d.py:328-374): warped-depth gradient ->
  clamp(|grad| * feather, 0, 1), box-blurred with ``blur_ksize``, lerps the
  warped frame back toward the *original* frame at depth edges.
- ``heal_missing_pixels`` (render_3d.py:431-459): warped-frame luminance
  gradient > 0.05 -> mask (union with an optional edge mask), blends the
  original in, then re-softens healed areas with an extra 3x3 blur. The
  reference defines but never calls this (advertised in
  VisionDepth3D_Method.md:65-68); here it is a first-class, wired stage.
"""

from __future__ import annotations

import jax.numpy as jnp

from .filters import box_blur, forward_diff_grad


def suppress_artifacts_with_edge_mask(
    depth: jnp.ndarray,
    total_shift: jnp.ndarray,
    feather_strength=10.0,
    edge_threshold=0.02,
) -> jnp.ndarray:
    """Soft-suppress the shift map near sharp depth edges. [H, W] in/out."""
    dx, dy = forward_diff_grad(depth)
    dx, dy = jnp.abs(dx), jnp.abs(dy)
    grad_mag = jnp.sqrt(dx * dx + dy * dy)
    edge_mask = jax_sigmoid((grad_mag - edge_threshold) * feather_strength * 5.0)
    smooth_mask = box_blur(1.0 - edge_mask, 5)
    return total_shift * smooth_mask


def jax_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return 1.0 / (1.0 + jnp.exp(-x))


def feather_shift_edges(
    shifted: jnp.ndarray,
    original: jnp.ndarray,
    warped_depth: jnp.ndarray,
    blur_ksize: int = 7,
    feather_strength=10.0,
) -> jnp.ndarray:
    """Blend warped frame back toward the original at depth edges.

    shifted/original: [H, W, 3]; warped_depth: [H, W]. Returns [H, W, 3]
    clamped to [0, 1]. blur_ksize is static (compiled into the stencil).
    """
    dx, dy = forward_diff_grad(warped_depth)
    grad_mag = jnp.sqrt(dx * dx + dy * dy)
    edge_mask = jnp.clip(
        grad_mag * jnp.asarray(feather_strength, grad_mag.dtype), 0.0, 1.0
    )
    blend = box_blur(edge_mask, blur_ksize)[..., None]
    out = shifted * (1.0 - blend) + original * blend
    return jnp.clip(out, 0.0, 1.0)


def heal_missing_pixels(
    warped_frame: jnp.ndarray,
    original_frame: jnp.ndarray,
    edge_mask: jnp.ndarray | None = None,
    heal_strength=0.5,
    threshold: float = 0.05,
) -> jnp.ndarray:
    """Conceal warp gaps by blending the original into high-gradient areas.

    warped_frame/original_frame: [H, W, 3]; edge_mask: optional [H, W].
    """
    warped_gray = jnp.mean(warped_frame, axis=-1)
    dx, dy = forward_diff_grad(warped_gray)
    grad_mag = jnp.sqrt(dx * dx + dy * dy)
    missing = (grad_mag > threshold).astype(warped_frame.dtype)
    missing = jnp.clip(box_blur(missing, 5), 0.0, 1.0)
    if edge_mask is not None:
        missing = jnp.maximum(missing, edge_mask.astype(missing.dtype))
    heal_strength = jnp.asarray(heal_strength, warped_frame.dtype)
    m = missing[..., None]
    healed = (1.0 - heal_strength * m) * warped_frame + heal_strength * m * original_frame
    soft = box_blur(jnp.moveaxis(healed, -1, 0), 3)
    soft = jnp.moveaxis(soft, 0, -1)
    healed = (1.0 - 0.3 * m) * healed + 0.3 * m * soft
    return jnp.clip(healed, 0.0, 1.0)
