"""Pallas TPU kernels for per-frame depth statistics.

The stereo stage runs several global statistics per frame (percentile
pair for the EMA normalizer, percentile pair for the Pop-Control stretch,
and the subject estimator's 64-bin histogram + masked median, three times
per frame). Each XLA bisection iteration re-reads the depth map from HBM
(~16 us/pass at 1080p, benchmarks/stats_micro.py); these kernels load the
map into VMEM ONCE and run every iteration/bin pass on-chip, so the HBM
cost is a single read per statistic group.

Numerics: identical to the XLA paths in ops/quantiles.py — sums of 0/1
predicates in f32 are exact below 2^24 elements, so the bisection takes
bitwise-identical decisions regardless of reduction order.

Both kernels run the whole array as one block (no grid): bisection is
globally serial per iteration, and a 1080p f32 frame (8.3 MB) plus
temporaries fits comfortably once the scoped VMEM limit is raised.
Callers fall back to the XLA implementations for arrays that don't fit
(guarded by ``fits_vmem``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# whole-array kernels: cap input size so x + a few same-size temporaries
# stay well under the raised VMEM limit (1080p f32 = 8.3 MB <= cap)
_MAX_ELEMS = 2_200_000
_VMEM_LIMIT = 100 * 1024 * 1024


def fits_vmem(shape) -> bool:
    n = 1
    for s in shape:
        n *= int(s)
    return n <= _MAX_ELEMS


def _qpair_kernel(iters: int, x_ref, q_ref, out_ref):
    x = x_ref[...]
    n = float(x.size)
    q0 = q_ref[0]
    q1 = q_ref[1]

    def body(_, carry):
        lo0, hi0, lo1, hi1 = carry
        m0 = (lo0 + hi0) * 0.5
        m1 = (lo1 + hi1) * 0.5
        # divide (not reciprocal-multiply) so the branch decision math is
        # bit-identical to bisect_quantile_01's `sum / count` (ADVICE r2)
        f0 = jnp.sum((x <= m0).astype(jnp.float32)) / n
        f1 = jnp.sum((x <= m1).astype(jnp.float32)) / n
        g0 = f0 < q0
        g1 = f1 < q1
        return (
            jnp.where(g0, m0, lo0), jnp.where(g0, hi0, m0),
            jnp.where(g1, m1, lo1), jnp.where(g1, hi1, m1),
        )

    z = jnp.float32(0.0)
    o = jnp.float32(1.0)
    lo0, hi0, lo1, hi1 = jax.lax.fori_loop(0, iters, body, (z, o, z, o))
    out_ref[0] = (lo0 + hi0) * 0.5
    out_ref[1] = (lo1 + hi1) * 0.5


def quantile_pair_pallas(x: jnp.ndarray, qs: jnp.ndarray,
                         iters: int = 12) -> jnp.ndarray:
    """Bisection quantiles of a 2-D f32 array in [0, 1] at two (traced)
    quantile points. Returns [2] f32; bitwise-matches
    ``bisect_quantile_01(x, qs, iters=iters)``."""
    assert x.ndim == 2
    return pl.pallas_call(
        functools.partial(_qpair_kernel, iters),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((2,), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(x.astype(jnp.float32), qs.astype(jnp.float32).reshape(2))


def _subject_kernel(bins: int, iters: int, x_ref, hist_ref, out_ref):
    x = x_ref[...]
    valid = (x > 0.05) & (x < 0.95)
    validf = valid.astype(jnp.float32)
    cnt = jnp.sum(validf)

    # 64-bin histogram: one compare-reduce per bin over VMEM, accumulated
    # into a lane vector (torch.histc bin semantics via the shared idx)
    idx = jnp.minimum(
        jnp.maximum(jnp.floor(x * float(bins)), 0.0), float(bins - 1)
    )  # f32 bin ids; == compare against float k is exact for small ints
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, bins), 1).astype(jnp.float32)

    def hb(b, hvec):
        bf = b.astype(jnp.float32)
        s = jnp.sum(jnp.where((idx == bf) & valid, 1.0, 0.0))
        return hvec + jnp.where(lane == bf, s, 0.0)

    hist = jax.lax.fori_loop(0, bins, hb, jnp.zeros((1, bins), jnp.float32))
    hist_ref[...] = hist

    # masked lower-middle median via bisection (hist_masked_median parity)
    count = jnp.maximum(cnt, 1.0)
    q = (jnp.floor((count - 1.0) * 0.5) + 1.0) / count

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) * 0.5
        frac = jnp.sum(jnp.where(valid & (x <= mid), 1.0, 0.0)) / count
        g = frac < q
        return jnp.where(g, mid, lo), jnp.where(g, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body,
                               (jnp.float32(0.0), jnp.float32(1.0)))
    out_ref[0] = cnt
    out_ref[1] = (lo + hi) * 0.5


def subject_stats_pallas(crop: jnp.ndarray, bins: int = 64,
                         iters: int = 12):
    """Subject-estimator statistics of a 2-D f32 crop in one VMEM pass.

    Returns (hist [bins] f32, count scalar f32, median scalar f32) with
    the exact semantics of histogram_01(crop, bins, valid) /
    hist_masked_median(crop, valid) for valid = 0.05 < crop < 0.95.
    """
    assert crop.ndim == 2
    hist, out = pl.pallas_call(
        functools.partial(_subject_kernel, bins, iters),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, bins), jnp.float32),
            jax.ShapeDtypeStruct((2,), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(crop.astype(jnp.float32))
    return hist[0], out[0], out[1]
