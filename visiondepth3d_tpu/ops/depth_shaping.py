"""Pop-Control depth shaping — the signature VisionDepth3D depth curve.

Behavioral spec from the reference:
- ``_signed_pow`` / ``shape_depth_for_pop`` (render_3d.py:515-558):
  1) percentile-stretch depth to [0, 1], 2) recenter so the subject sits at
  ``depth_mid``, 3) symmetric signed-power contrast about the mid plane.
- ``enhance_curvature`` (render_3d.py:175-187): additive dome profile.
- ``midtone_shape`` (render_3d.py:265-270): plain gamma (kept for API parity).

All functions take/return [H, W] (or broadcastable) float depth in [0, 1].
Quantiles run in histogram mode by default (see ops.quantiles) so the whole
shaping stage is one fused elementwise pass over the frame.
"""

from __future__ import annotations

import jax.numpy as jnp

from .quantiles import QuantileMode, quantile_01


def signed_pow(x: jnp.ndarray, gamma) -> jnp.ndarray:
    """sign(x) * |x|**gamma — symmetric contrast about 0 (render_3d.py:515-517)."""
    return jnp.sign(x) * jnp.abs(x) ** gamma


def shape_depth_for_pop(
    depth01: jnp.ndarray,
    subject_depth: jnp.ndarray,
    *,
    stretch_lo=0.05,
    stretch_hi=0.95,
    depth_mid=0.50,
    gamma=0.85,
    quantile_mode: QuantileMode = "hist",
) -> jnp.ndarray:
    """Stretch-recenter-curve shaping (render_3d.py:519-558 semantics).

    Both the frame and the scalar subject depth are mapped through the same
    percentile stretch; degenerate ranges (hi - lo < 1e-5) fall back to the
    unstretched values, matching the reference's guard.
    """
    d = jnp.clip(depth01, 0.0, 1.0)
    q = quantile_01(d, jnp.stack([jnp.asarray(stretch_lo), jnp.asarray(stretch_hi)]),
                    mode=quantile_mode)
    lo, hi = q[0], q[1]
    degenerate = (hi - lo) < 1e-5
    d_stretched = jnp.where(
        degenerate, d, jnp.clip((d - lo) / (hi - lo + 1e-6), 0.0, 1.0)
    )
    subj = jnp.clip(subject_depth, 0.0, 1.0)
    subj_stretched = jnp.where(
        degenerate, subj, jnp.clip((subj - lo) / (hi - lo + 1e-6), 0.0, 1.0)
    )
    centered = d_stretched - subj_stretched + depth_mid
    shaped = signed_pow(centered - depth_mid, gamma) + depth_mid
    return jnp.clip(shaped, 0.0, 1.0)


def enhance_curvature(depth: jnp.ndarray, strength=0.08) -> jnp.ndarray:
    """Add a centered dome 1 - (x^2 + y^2) * strength (render_3d.py:175-187).

    The render path always calls this with strength=0.08 (render_3d.py:599).
    Output is NOT clamped here; the caller clamps (render_3d.py:601).
    """
    h, w = depth.shape[-2], depth.shape[-1]
    yy = jnp.linspace(-1.0, 1.0, h, dtype=depth.dtype)[:, None]
    xx = jnp.linspace(-1.0, 1.0, w, dtype=depth.dtype)[None, :]
    curvature = 1.0 - (xx * xx + yy * yy)
    return depth + curvature * strength


def midtone_shape(depth01: jnp.ndarray, gamma=0.85) -> jnp.ndarray:
    """Gentle power curve d**gamma (render_3d.py:265-270; unused by the
    reference render loop but part of the public op surface)."""
    return jnp.clip(depth01, 0.0, 1.0) ** gamma
