"""Scene statistics: subject depth, dynamic parallax scale, motion metric.

Behavioral spec from the reference:
- ``estimate_subject_depth`` (render_3d.py:145-172): 60% center crop,
  validity band 0.05 < d < 0.95, 64-bin histogram peak blended 70/30 with
  the masked median; < 20 valid pixels falls back to 0.5.
- ``compute_dynamic_parallax_scale`` (render_3d.py:412-427): normalized
  center-crop depth variance (torch.var => ddof=1) mapped to a scale range.
  The render loop calls it with min_scale=0.90, max_scale=1.15
  (render_3d.py:1273).
- ``compute_motion_metric`` (render_3d.py:924-929): clamp(mean |delta d| * 4).

These are TPU-friendly reductions: one histogram pass + (optionally) one
sort. With histogram mode the subject estimator is pure psum-able
reductions, so it spatially shards for free.
"""

from __future__ import annotations

import jax.numpy as jnp

from .quantiles import QuantileMode, histogram_01, masked_median_01

SUBJECT_HIST_BINS = 64


def estimate_subject_depth(
    depth: jnp.ndarray, quantile_mode: QuantileMode = "hist"
) -> jnp.ndarray:
    """Histogram-peak subject depth of a [H, W] depth map in [0, 1] -> scalar."""
    import jax

    h, w = depth.shape[-2], depth.shape[-1]
    crop = depth[..., h // 5 : h * 4 // 5, w // 5 : w * 4 // 5]
    if (
        quantile_mode != "exact"
        and crop.ndim == 2
        and jax.default_backend() == "tpu"
    ):
        from .pallas_stats import fits_vmem, subject_stats_pallas

        if fits_vmem(crop.shape):
            # one VMEM pass computes hist + count + median (same semantics
            # as the XLA ops below, see pallas_stats.py)
            hist, count, median_depth = subject_stats_pallas(
                crop, SUBJECT_HIST_BINS
            )
            peak_bin = jnp.argmax(hist)
            subject_depth = (
                peak_bin.astype(depth.dtype) + 0.5
            ) / SUBJECT_HIST_BINS
            smoothed = jnp.clip(
                0.7 * subject_depth + 0.3 * median_depth, 0.0, 1.0
            )
            return jnp.where(
                count < 20, jnp.asarray(0.5, depth.dtype), smoothed
            )
    valid = (crop > 0.05) & (crop < 0.95)
    count = jnp.sum(valid)

    hist = histogram_01(crop, SUBJECT_HIST_BINS, valid)
    peak_bin = jnp.argmax(hist)
    bin_width = 1.0 / SUBJECT_HIST_BINS
    subject_depth = (peak_bin.astype(depth.dtype) + 0.5) * bin_width

    median_depth = masked_median_01(crop, valid, mode=quantile_mode)
    smoothed = jnp.clip(0.7 * subject_depth + 0.3 * median_depth, 0.0, 1.0)
    return jnp.where(count < 20, jnp.asarray(0.5, depth.dtype), smoothed)


def dynamic_parallax_scale(
    depth: jnp.ndarray, min_scale=0.90, max_scale=1.15
) -> jnp.ndarray:
    """Variance-adaptive parallax scale over the 50% center crop -> scalar."""
    h, w = depth.shape[-2], depth.shape[-1]
    crop = depth[..., h // 4 : h * 3 // 4, w // 4 : w * 3 // 4]
    mean = jnp.mean(crop)
    n = crop.size
    # torch.var default is the unbiased (ddof=1) estimator
    var = jnp.sum((crop - mean) ** 2) / jnp.maximum(n - 1, 1)
    norm_var = jnp.clip(var / (mean + 1e-5), 0.0, 1.0)
    return min_scale + norm_var * (max_scale - min_scale)


def motion_metric(prev_depth: jnp.ndarray, curr_depth: jnp.ndarray) -> jnp.ndarray:
    """Scene-motion scalar in [0, 1]: clamp(mean |curr - prev| * 4)."""
    mad = jnp.mean(jnp.abs(curr_depth - prev_depth))
    return jnp.clip(mad * 4.0, 0.0, 1.0)
