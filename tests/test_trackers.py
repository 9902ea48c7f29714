"""Functional tracker pytree vs stateful transcriptions of the reference
classes (render_3d.py:220-285, 463-511, 895-922)."""

import numpy as np
import jax.numpy as jnp

from visiondepth3d_tpu.state import trackers as trk


# ---- python transcriptions (the reference classes' documented behavior) ----


class PyTemporal:
    def __init__(self, alpha=0.5):
        self.prev, self.alpha = None, alpha

    def smooth(self, d):
        if self.prev is None:
            self.prev = d.copy()
        self.prev = self.alpha * self.prev + (1 - self.alpha) * d
        return self.prev


class PyPercentileEMA:
    def __init__(self, p_lo=0.02, p_hi=0.98, alpha=0.92):
        self.p_lo, self.p_hi, self.alpha = p_lo, p_hi, alpha
        self.lo = self.hi = None

    def normalize(self, d):
        d = np.clip(d, 0, 1)
        lo = np.quantile(d, self.p_lo)
        hi = np.quantile(d, self.p_hi)
        if (hi - lo) < 1e-5:
            return d
        if self.lo is None:
            self.lo, self.hi = lo, hi
        else:
            self.lo = self.alpha * self.lo + (1 - self.alpha) * lo
            self.hi = self.alpha * self.hi + (1 - self.alpha) * hi
        return np.clip((d - self.lo) / (self.hi - self.lo + 1e-6), 0, 1)


class PyConvEMA:
    def __init__(self, alpha=0.97):
        self.alpha, self.val = alpha, None

    def update(self, x):
        self.val = x if self.val is None else self.alpha * self.val + (1 - self.alpha) * x
        return self.val


class PyShiftSmoother:
    def __init__(self, alpha=0.15):
        self.alpha = alpha
        self.prev = None

    def smooth(self, fg, mg, bg):
        if self.prev is None:
            self.prev = [fg, mg, bg]
        else:
            self.prev = [
                self.alpha * v + (1 - self.alpha) * p
                for v, p in zip((fg, mg, bg), self.prev)
            ]
        return tuple(self.prev)


class PyFloatingWindow:
    def __init__(self, alpha=0.97):
        self.prev, self.alpha, self.counter = 0.0, alpha, 0

    def smooth(self, cur, threshold=0.0015):
        if abs(cur - self.prev) < threshold:
            return self.prev
        self.prev = self.alpha * self.prev + (1 - self.alpha) * cur
        self.counter += 1
        if self.counter >= 100:
            self.prev = max(min(self.prev, 1.0), -1.0)
            self.counter = 0
        return self.prev


class PyBarEaser:
    def __init__(self, alpha=0.85):
        self.prev, self.alpha = 0, alpha

    def ease(self, cur):
        self.prev = int(self.alpha * self.prev + (1 - self.alpha) * cur)
        return self.prev


class PyFocal:
    def __init__(self, deadband=0.03, max_step=0.02):
        self.deadband, self.max_step, self.focal, self.alpha = deadband, max_step, None, 0.15

    def set_scene_motion(self, m):
        self.alpha = 0.10 + 0.20 * max(0.0, min(1.0, m))

    def update(self, c):
        if self.focal is None:
            self.focal = c
            return c
        if abs(c - self.focal) < self.deadband:
            c = self.focal
        new = (1 - self.alpha) * self.focal + self.alpha * c
        delta = new - self.focal
        if delta > self.max_step:
            new = self.focal + self.max_step
        elif delta < -self.max_step:
            new = self.focal - self.max_step
        self.focal = max(0.0, min(1.0, new))
        return self.focal


def _seq(n, seed=0, lo=0.0, hi=1.0):
    return np.random.default_rng(seed).uniform(lo, hi, n).astype(np.float32)


def test_temporal_depth_filter(rng):
    t = trk.init_trackers(8, 8)
    py = PyTemporal(0.5)
    t = t.replace(initialized=jnp.asarray(False))
    for i in range(6):
        d = rng.random((8, 8)).astype(np.float32)
        t, out = trk.temporal_depth_smooth(t, jnp.asarray(d), 0.5)
        t = t.replace(initialized=jnp.asarray(True))
        ref = py.smooth(d)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def test_percentile_ema(rng):
    t = trk.init_trackers(16, 16)
    py = PyPercentileEMA()
    for i in range(8):
        d = rng.random((16, 16)).astype(np.float32)
        t, out = trk.percentile_ema_normalize(t, jnp.asarray(d), 0.02, 0.98, 0.92, "exact")
        ref = py.normalize(d)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_percentile_ema_degenerate_frame_skips_update(rng):
    t = trk.init_trackers(16, 16)
    d0 = rng.random((16, 16)).astype(np.float32)
    t, _ = trk.percentile_ema_normalize(t, jnp.asarray(d0), 0.02, 0.98, 0.92, "exact")
    lo_before = float(t.norm_lo)
    flat = np.full((16, 16), 0.5, np.float32)
    t, out = trk.percentile_ema_normalize(t, jnp.asarray(flat), 0.02, 0.98, 0.92, "exact")
    assert float(t.norm_lo) == lo_before  # EMA untouched
    np.testing.assert_allclose(np.asarray(out), flat)  # passthrough


def test_conv_ema():
    t = trk.init_trackers(4, 4)
    py = PyConvEMA(0.97)
    for x in _seq(10, 1, -0.1, 0.1):
        t, out = trk.convergence_ema_update(t, jnp.float32(x), 0.97)
        assert abs(float(out) - py.update(float(x))) < 1e-6


def test_shift_smoother():
    t = trk.init_trackers(4, 4)
    py = PyShiftSmoother(0.15)
    for i in range(6):
        fg, mg, bg = 8.0 + i, -3.0 - i, -6.0 + 0.5 * i
        t, (a, b, c) = trk.shift_smoother_update(t, fg, mg, bg, 0.15)
        ra, rb, rc = py.smooth(fg, mg, bg)
        assert abs(float(a) - ra) < 1e-5 and abs(float(b) - rb) < 1e-5
        assert abs(float(c) - rc) < 1e-5


def test_floating_window_deadband_and_clamp():
    t = trk.init_trackers(4, 4)
    py = PyFloatingWindow(0.97)
    seq = np.concatenate([
        _seq(150, 2, -0.3, 0.3),  # drive counter past the 100-update clamp
        np.full(5, 0.0001, np.float32),  # deadband region (prev ~ small)
    ])
    for x in seq:
        t, out = trk.floating_window_update(t, jnp.float32(x), 0.97, 0.0015)
        ref = py.smooth(float(x), 0.0015)
        assert abs(float(out) - ref) < 1e-5
    assert int(t.fw_counter) == py.counter


def test_bar_easer():
    t = trk.init_trackers(4, 4)
    py = PyBarEaser(0.85)
    for x in [10, 40, 80, 80, 80, 20, 0, 0, 55]:
        t, out = trk.bar_easer_update(t, jnp.float32(x), 0.85)
        assert int(out) == py.ease(x)


def test_focal_tracker():
    t = trk.init_trackers(4, 4)
    py = PyFocal()
    cands = _seq(30, 3, 0.2, 0.8)
    motions = _seq(30, 4, 0.0, 1.0)
    for c, m in zip(cands, motions):
        py.set_scene_motion(float(m))
        t, out = trk.focal_tracker_update(t, jnp.float32(c), jnp.float32(m))
        ref = py.update(float(c))
        assert abs(float(out) - ref) < 1e-6
