"""Color grading: saturation / contrast / brightness in linear RGB.

Behavioral spec: ``apply_color_grade`` (render_3d.py:734-767) — Rec.709 luma,
chroma lerp for saturation, symmetric contrast about 0.5, additive
brightness, final clamp. Pure elementwise math; fuses into the stereo graph.
"""

from __future__ import annotations

import jax.numpy as jnp

REC709 = (0.2126, 0.7152, 0.0722)


def apply_color_grade(
    rgb: jnp.ndarray, saturation=1.0, contrast=1.0, brightness=0.0
) -> jnp.ndarray:
    """rgb: [..., 3] float in [0, 1] (channel-last). All params may be traced."""
    # keep the op dtype-preserving: traced f32 scalars must not upcast a
    # bf16 image back to f32
    saturation = jnp.asarray(saturation, rgb.dtype)
    contrast = jnp.asarray(contrast, rgb.dtype)
    brightness = jnp.asarray(brightness, rgb.dtype)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    luma = REC709[0] * r + REC709[1] * g + REC709[2] * b
    luma = luma[..., None]
    rgb_sat = luma + (rgb - luma) * saturation
    rgb_con = 0.5 + (rgb_sat - 0.5) * contrast
    return jnp.clip(rgb_con + brightness, 0.0, 1.0)
