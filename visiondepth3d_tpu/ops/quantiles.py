"""Quantile / histogram / median primitives for depth statistics.

The reference stereo engine leans on three torch statistics (see
``/root/reference/core/render_3d.py``):

- ``torch.quantile`` for the Pop-Control percentile stretch
  (``shape_depth_for_pop``, render_3d.py:536-537) and the temporal
  percentile EMA normalizer (render_3d.py:249-250),
- ``torch.histc(valid, bins=64, 0, 1)`` + ``torch.median`` for the subject
  depth estimator (render_3d.py:163-169).

Sorting multi-megapixel depth maps every frame is the wrong fit for the TPU
(XLA sorts are serial-ish and HBM-heavy), so this module provides two
interchangeable implementations:

- ``exact``: sort-based, bit-matching torch's linear-interpolation quantile.
  Used in parity tests and available at runtime.
- ``hist``: a fixed-bin histogram inversion over the known [0, 1] depth
  domain. One elementwise pass + a tiny (NBINS,) reduction, fuses into the
  surrounding graph, and is exactly what a `psum` needs for spatially
  sharded frames. Max error = one bin width (1/2048 by default), far below
  the u8 quantization step (1/255) the reference pipeline itself introduces.

All functions take an optional validity mask instead of boolean indexing
(data-dependent shapes don't exist under jit).
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp

QuantileMode = Literal["hist", "exact"]

DEFAULT_BINS = 2048


def histogram_01(x: jnp.ndarray, bins: int, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Histogram of values over [0, 1] with torch.histc bin semantics.

    Bin ``i`` covers ``[i/bins, (i+1)/bins)``; the final bin is closed so a
    value of exactly 1.0 lands in bin ``bins - 1`` (torch.histc behavior).
    ``mask`` (same shape, float or bool) weights each element; elements with
    mask 0 are excluded.
    """
    x = x.reshape(-1)
    idx = jnp.clip(jnp.floor(x * bins).astype(jnp.int32), 0, bins - 1)
    if mask is not None:
        weights = mask.reshape(-1).astype(x.dtype)
    else:
        weights = None
    return jnp.zeros((bins,), dtype=x.dtype).at[idx].add(
        weights if weights is not None else 1.0
    )


def _hist_cdf_invert(hist: jnp.ndarray, count: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Invert a histogram CDF at quantile(s) q with in-bin linear interpolation."""
    bins = hist.shape[0]
    cdf = jnp.cumsum(hist)
    # target rank in [0, count]
    target = q * count
    # first bin whose cumulative count reaches the target
    bin_idx = jnp.searchsorted(cdf, target, side="left")
    bin_idx = jnp.clip(bin_idx, 0, bins - 1)
    cdf_lo = jnp.where(bin_idx > 0, cdf[jnp.maximum(bin_idx - 1, 0)], 0.0)
    in_bin = jnp.maximum(hist[bin_idx], 1e-12)
    frac = jnp.clip((target - cdf_lo) / in_bin, 0.0, 1.0)
    return (bin_idx.astype(hist.dtype) + frac) / bins


def hist_quantile(
    x: jnp.ndarray,
    q,
    mask: jnp.ndarray | None = None,
    bins: int = DEFAULT_BINS,
) -> jnp.ndarray:
    """Approximate quantile(s) of values in [0, 1] via histogram inversion."""
    q = jnp.asarray(q, dtype=x.dtype)
    hist = histogram_01(x, bins, mask)
    count = jnp.sum(hist)
    return _hist_cdf_invert(hist, count, q)


def exact_quantile(x: jnp.ndarray, q, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """torch.quantile parity: linear interpolation between order statistics.

    With a mask, invalid elements are sorted to +inf and the interpolation
    index is computed against the valid count (matches torch.quantile applied
    to the boolean-indexed subset).
    """
    q = jnp.asarray(q, dtype=x.dtype)
    flat = x.reshape(-1)
    if mask is None:
        return jnp.quantile(flat, q)
    m = mask.reshape(-1)
    n = flat.shape[0]
    sortkey = jnp.where(m, flat, jnp.inf)
    s = jnp.sort(sortkey)
    count = jnp.sum(m.astype(jnp.int32))
    pos = q * (count.astype(q.dtype) - 1.0)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 1)
    hi = jnp.clip(lo + 1, 0, jnp.maximum(count - 1, 0))
    w = pos - lo.astype(q.dtype)
    return s[lo] * (1.0 - w) + s[hi] * w


def quantile_01(
    x: jnp.ndarray,
    q,
    mask: jnp.ndarray | None = None,
    mode: QuantileMode = "hist",
    bins: int = DEFAULT_BINS,
) -> jnp.ndarray:
    """Quantile of values known to lie in [0, 1]. Dispatch on mode."""
    if mode == "exact":
        return exact_quantile(x, q, mask)
    return hist_quantile(x, q, mask, bins)


def exact_masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """torch.median parity on a masked subset: the lower-middle order statistic.

    torch.median of n elements returns sorted[(n - 1) // 2] (NOT the mean of
    the two middle elements) — render_3d.py:169 relies on this.
    """
    flat = x.reshape(-1)
    m = mask.reshape(-1)
    s = jnp.sort(jnp.where(m, flat, jnp.inf))
    count = jnp.sum(m.astype(jnp.int32))
    idx = jnp.clip((count - 1) // 2, 0, flat.shape[0] - 1)
    return s[idx]


def hist_masked_median(
    x: jnp.ndarray, mask: jnp.ndarray, bins: int = DEFAULT_BINS
) -> jnp.ndarray:
    """Histogram approximation of the masked lower-middle median."""
    hist = histogram_01(x, bins, mask)
    count = jnp.sum(hist)
    # lower-middle order statistic ~ rank (count-1)//2 + 1 in 1-based counts;
    # approximate with the 0.5*(count-1)/count quantile of the histogram.
    q = jnp.where(count > 0, 0.5 * (count - 1.0) / jnp.maximum(count, 1.0), 0.5)
    return _hist_cdf_invert(hist, count, jnp.asarray(q, dtype=hist.dtype))


def masked_median_01(
    x: jnp.ndarray,
    mask: jnp.ndarray,
    mode: QuantileMode = "hist",
    bins: int = DEFAULT_BINS,
) -> jnp.ndarray:
    if mode == "exact":
        return exact_masked_median(x, mask)
    return hist_masked_median(x, mask, bins)
