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

    TPU note: computed as a one-hot compare-and-reduce (bins accumulators on
    the VPU, fused with the index computation), NOT a scatter-add —
    multi-megapixel scatters serialize on TPU and were measured 2 orders of
    magnitude slower than this formulation.
    """
    x = x.reshape(-1)
    idx = jnp.clip(jnp.floor(x * bins).astype(jnp.int32), 0, bins - 1)
    w = mask.reshape(-1).astype(x.dtype) if mask is not None else None
    # pad to a multiple of the lane width and fold into [rows, 256] so the
    # per-bin compare-reduce vectorizes cleanly
    lane = 256
    n = idx.shape[0]
    pad = (-n) % lane
    if pad:
        idx = jnp.concatenate([idx, jnp.full((pad,), -1, jnp.int32)])
        if w is not None:
            w = jnp.concatenate([w, jnp.zeros((pad,), x.dtype)])
    idx2 = idx.reshape(-1, lane)
    w2 = w.reshape(-1, lane) if w is not None else None
    bins_ids = jnp.arange(bins, dtype=jnp.int32)
    onehot = idx2[:, :, None] == bins_ids[None, None, :]
    if w2 is not None:
        contrib = onehot.astype(x.dtype) * w2[:, :, None]
    else:
        contrib = onehot.astype(x.dtype)
    return jnp.sum(contrib, axis=(0, 1))


def bisect_quantile_01(
    x: jnp.ndarray,
    q,
    mask: jnp.ndarray | None = None,
    iters: int = 12,
) -> jnp.ndarray:
    """Quantile(s) of values in [0, 1] by bisection on the value axis.

    Each iteration is one fused compare+mean pass over the data (VPU work,
    no sort, no scatter); the default ``iters=12`` resolves to 2^-12 in
    depth units — 2x finer than the 2048-bin histogram this replaced and
    16x below the u8 step the reference pipeline quantizes depth to. Cost
    is linear in ``iters`` (~16 us/iteration at 1080p). Exactly matches
    the CDF-inversion semantics the histogram method approximates, with
    less memory traffic.
    """
    q_in = jnp.asarray(q, dtype=x.dtype)
    qv = jnp.atleast_1d(q_in)
    nq = qv.shape[0]
    flat = x.reshape(-1)
    if mask is not None:
        m = mask.reshape(-1).astype(x.dtype)
        count = jnp.maximum(jnp.sum(m), 1.0)
    else:
        m = None
        count = float(flat.shape[0])

    lo = jnp.zeros_like(qv)
    hi = jnp.ones_like(qv)
    for _ in range(iters):
        mid = (lo + hi) * 0.5
        # One compare-and-reduce per quantile against a SCALAR threshold.
        # The broadcast form `flat[None, :] <= mid[:, None]` materializes an
        # [nq, N] f32 intermediate in HBM (measured 59 us/iteration at
        # 1080p — 4x the cost of the 8 MB input read); scalar thresholds
        # keep each pass a single fused read+reduce, and XLA multi-output
        # fusion shares the read across the nq reduces.
        fracs = []
        for i in range(nq):
            le = (flat <= mid[i]).astype(x.dtype)
            if m is not None:
                le = le * m
            fracs.append(jnp.sum(le))
        frac = jnp.stack(fracs) / count
        go_right = frac < qv
        lo = jnp.where(go_right, mid, lo)
        hi = jnp.where(go_right, hi, mid)
    out = (lo + hi) * 0.5
    return out.reshape(q_in.shape)


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
    """Quantile of values known to lie in [0, 1]. Dispatch on mode.

    "hist" (the fast TPU path) resolves via value-axis bisection — same
    CDF semantics the fixed-bin histogram approximated, with fused
    compare+reduce passes instead of scatter/sort work. On TPU, 2-D
    unmasked quantile pairs take a VMEM-resident Pallas kernel (one HBM
    read for all iterations, bitwise-identical decisions).
    """
    if mode == "exact":
        return exact_quantile(x, q, mask)
    q_in = jnp.asarray(q, dtype=x.dtype)
    if (
        mask is None
        and getattr(x, "ndim", 0) == 2
        and q_in.size == 2
        and jax.default_backend() == "tpu"
    ):
        from .pallas_stats import fits_vmem, quantile_pair_pallas

        if fits_vmem(x.shape):
            return quantile_pair_pallas(x, q_in.reshape(2)).reshape(q_in.shape)
    return bisect_quantile_01(x, q, mask)


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
    """Bisection approximation of the masked lower-middle median."""
    count = jnp.maximum(jnp.sum(mask.astype(x.dtype)), 1.0)
    # lower-middle order statistic: 1-based rank floor((n-1)/2) + 1
    q = (jnp.floor((count - 1.0) / 2.0) + 1.0) / count
    return bisect_quantile_01(x, q, mask)


def masked_median_01(
    x: jnp.ndarray,
    mask: jnp.ndarray,
    mode: QuantileMode = "hist",
    bins: int = DEFAULT_BINS,
) -> jnp.ndarray:
    if mode == "exact":
        return exact_masked_median(x, mask)
    return hist_masked_median(x, mask, bins)
