"""Quantile/histogram/median primitives vs torch ground truth."""

import numpy as np
import torch
import jax.numpy as jnp

from visiondepth3d_tpu.ops import quantiles as q


def test_exact_quantile_matches_torch(rng):
    x = rng.random((57, 91)).astype(np.float32)
    for qq in (0.02, 0.05, 0.5, 0.95, 0.98):
        ours = float(q.exact_quantile(jnp.asarray(x), qq))
        ref = float(torch.quantile(torch.from_numpy(x), qq))
        assert abs(ours - ref) < 1e-6, (qq, ours, ref)


def test_exact_masked_quantile_matches_torch_subset(rng):
    x = rng.random((40, 40)).astype(np.float32)
    mask = (x > 0.05) & (x < 0.95)
    subset = torch.from_numpy(x[mask])
    for qq in (0.05, 0.5, 0.95):
        ours = float(q.exact_quantile(jnp.asarray(x), qq, jnp.asarray(mask)))
        ref = float(torch.quantile(subset, qq))
        assert abs(ours - ref) < 1e-6


def test_hist_quantile_close_to_exact(rng):
    x = rng.random((128, 128)).astype(np.float32)
    for qq in (0.02, 0.05, 0.5, 0.95, 0.98):
        approx = float(q.hist_quantile(jnp.asarray(x), qq))
        exact = float(q.exact_quantile(jnp.asarray(x), qq))
        assert abs(approx - exact) <= 1.5 / q.DEFAULT_BINS + 1e-6


def test_histogram_matches_torch_histc(rng):
    x = rng.random((64, 64)).astype(np.float32)
    x.flat[0] = 0.0
    x.flat[1] = 1.0  # exercise the closed last bin
    ours = np.asarray(q.histogram_01(jnp.asarray(x), 64))
    ref = torch.histc(torch.from_numpy(x), bins=64, min=0.0, max=1.0).numpy()
    np.testing.assert_allclose(ours, ref)


def test_masked_histogram(rng):
    x = rng.random((64, 64)).astype(np.float32)
    mask = x > 0.5
    ours = np.asarray(q.histogram_01(jnp.asarray(x), 64, jnp.asarray(mask)))
    ref = torch.histc(torch.from_numpy(x[mask]), bins=64, min=0.0, max=1.0).numpy()
    np.testing.assert_allclose(ours, ref)


def test_exact_masked_median_matches_torch(rng):
    for n in (11, 12):  # odd and even counts: torch.median is lower-middle
        x = rng.random((n,)).astype(np.float32)
        mask = np.ones(n, dtype=bool)
        ours = float(q.exact_masked_median(jnp.asarray(x), jnp.asarray(mask)))
        ref = float(torch.median(torch.from_numpy(x)))
        assert abs(ours - ref) < 1e-7


def test_hist_median_close(rng):
    x = rng.random((100, 100)).astype(np.float32)
    mask = (x > 0.05) & (x < 0.95)
    approx = float(q.hist_masked_median(jnp.asarray(x), jnp.asarray(mask)))
    exact = float(q.exact_masked_median(jnp.asarray(x), jnp.asarray(mask)))
    assert abs(approx - exact) <= 1.5 / q.DEFAULT_BINS + 1e-6


def test_pallas_quantile_pair_matches_bisect(rng):
    """VMEM-resident quantile-pair kernel (interpret mode) == XLA bisection,
    bitwise: 0/1 predicate sums are exact in f32, so every bisection
    decision is reduction-order independent."""
    from jax.experimental.pallas import tpu as pltpu

    from visiondepth3d_tpu.ops.pallas_stats import quantile_pair_pallas

    x = jnp.asarray(rng.random((64, 256)).astype(np.float32))
    qs = jnp.asarray([0.02, 0.98], jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(quantile_pair_pallas(x, qs))
    ref = np.asarray(q.bisect_quantile_01(x, qs, iters=12))
    np.testing.assert_array_equal(got, ref)


def test_pallas_subject_stats_matches_ops(rng):
    from jax.experimental.pallas import tpu as pltpu

    from visiondepth3d_tpu.ops.pallas_stats import subject_stats_pallas

    x = jnp.asarray(rng.random((64, 128)).astype(np.float32))
    valid = (x > 0.05) & (x < 0.95)
    with pltpu.force_tpu_interpret_mode():
        hist, count, median = subject_stats_pallas(x, 64)
    np.testing.assert_array_equal(
        np.asarray(hist), np.asarray(q.histogram_01(x, 64, valid)))
    assert float(count) == float(jnp.sum(valid))
    ref_med = float(q.hist_masked_median(x, valid))
    assert abs(float(median) - ref_med) < 1e-7
