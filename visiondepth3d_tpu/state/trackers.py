"""Cross-frame EMA trackers as a functional pytree.

The reference keeps seven pieces of mutable cross-frame state as Python
classes and module globals (render_3d.py:220-285, 463-511, 895-922). Here
they are one immutable ``StereoTrackers`` pytree threaded through
``lax.scan`` — the only sequential dependency in the whole stereo stage, so
it is also the unit of checkpoint/resume for chunked renders.

Parity notes baked into the update rules:
- TemporalDepthFilter (alpha=0.5 at render time, render_3d.py:1176):
  first frame passes through unchanged.
- DepthPercentileEMA (p 0.02/0.98, alpha=0.92, render_3d.py:284): a
  degenerate range (hi - lo < 1e-5) returns the input *and leaves the EMA
  state untouched*.
- FloatingWindowTracker (alpha=0.97, render_3d.py:500, threshold=0.0015 at
  the call site :652): jitter deadband skips both the EMA update and the
  frame counter; every 100 updates the offset is clamped to [-1, 1].
- FloatingBarEaser (alpha=0.85, render_3d.py:511): the eased width is
  truncated to int each step.
- FocalDepthTracker (deadband 0.03, max_step 0.02): alpha is re-derived
  every frame from the scene-motion metric as 0.10 + 0.20 * motion
  (render_3d.py:905-908).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..ops.quantiles import QuantileMode, quantile_01


@struct.dataclass
class StereoTrackers:
    """All cross-frame state for the stereo stage. Shapes: prev_depth is
    [H, W] at the working resolution; everything else is scalar f32."""

    initialized: jnp.ndarray  # bool — False only before the first frame
    prev_depth: jnp.ndarray  # TemporalDepthFilter state
    prev_norm_depth: jnp.ndarray  # previous normalized depth (motion metric)
    norm_lo: jnp.ndarray  # DepthPercentileEMA
    norm_hi: jnp.ndarray
    norm_init: jnp.ndarray  # bool
    conv_val: jnp.ndarray  # ConvergenceEMA
    conv_init: jnp.ndarray  # bool
    fg: jnp.ndarray  # ShiftSmoother
    mg: jnp.ndarray
    bg: jnp.ndarray
    shift_init: jnp.ndarray  # bool
    fw_offset: jnp.ndarray  # FloatingWindowTracker
    fw_counter: jnp.ndarray  # int32
    bar_width: jnp.ndarray  # FloatingBarEaser (float, trunc applied)
    focal: jnp.ndarray  # FocalDepthTracker
    focal_init: jnp.ndarray  # bool


def init_trackers(height: int, width: int, dtype=jnp.float32) -> StereoTrackers:
    # NOTE: every field gets its own freshly-created array. Sharing one zero
    # buffer across fields breaks buffer donation ("attempt to donate the
    # same buffer twice") when the tracker pytree is a donated jit argument.
    def z():
        return jnp.zeros((), dtype)

    def f():
        return jnp.zeros((), jnp.bool_)

    return StereoTrackers(
        initialized=f(),
        prev_depth=jnp.zeros((height, width), dtype),
        prev_norm_depth=jnp.zeros((height, width), dtype),
        norm_lo=z(),
        norm_hi=z(),
        norm_init=f(),
        conv_val=z(),
        conv_init=f(),
        fg=z(),
        mg=z(),
        bg=z(),
        shift_init=f(),
        fw_offset=z(),
        fw_counter=jnp.zeros((), jnp.int32),
        bar_width=z(),
        focal=z(),
        focal_init=f(),
    )


# --- individual tracker updates (pure; each returns (new_state_fields, out)) ---


def temporal_depth_smooth(
    trackers: StereoTrackers, depth: jnp.ndarray, alpha=0.5
) -> tuple[StereoTrackers, jnp.ndarray]:
    prev = jnp.where(trackers.initialized, trackers.prev_depth, depth)
    smoothed = alpha * prev + (1.0 - alpha) * depth
    return trackers.replace(prev_depth=smoothed), smoothed


def percentile_ema_normalize(
    trackers: StereoTrackers,
    depth01: jnp.ndarray,
    p_lo=0.02,
    p_hi=0.98,
    alpha=0.92,
    quantile_mode: QuantileMode = "hist",
) -> tuple[StereoTrackers, jnp.ndarray]:
    d = jnp.clip(depth01, 0.0, 1.0)
    q = quantile_01(d, jnp.stack([jnp.asarray(p_lo), jnp.asarray(p_hi)]), mode=quantile_mode)
    lo, hi = q[0], q[1]
    degenerate = (hi - lo) < 1e-5
    new_lo = jnp.where(trackers.norm_init, alpha * trackers.norm_lo + (1 - alpha) * lo, lo)
    new_hi = jnp.where(trackers.norm_init, alpha * trackers.norm_hi + (1 - alpha) * hi, hi)
    # degenerate frames neither normalize nor update the EMA
    new_lo = jnp.where(degenerate, trackers.norm_lo, new_lo)
    new_hi = jnp.where(degenerate, trackers.norm_hi, new_hi)
    new_init = jnp.where(degenerate, trackers.norm_init, jnp.asarray(True))
    out = jnp.where(
        degenerate, d, jnp.clip((d - new_lo) / (new_hi - new_lo + 1e-6), 0.0, 1.0)
    )
    return trackers.replace(norm_lo=new_lo, norm_hi=new_hi, norm_init=new_init), out


def convergence_ema_update(
    trackers: StereoTrackers, x: jnp.ndarray, alpha=0.97
) -> tuple[StereoTrackers, jnp.ndarray]:
    val = jnp.where(
        trackers.conv_init, alpha * trackers.conv_val + (1 - alpha) * x, x
    )
    return trackers.replace(conv_val=val, conv_init=jnp.asarray(True)), val


def shift_smoother_update(
    trackers: StereoTrackers, fg, mg, bg, alpha=0.15
) -> tuple[StereoTrackers, tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """ShiftSmoother(0.15) (render_3d.py:463-477, 1174): note the reference
    blends *toward the new value* with weight alpha."""
    fg, mg, bg = jnp.asarray(fg), jnp.asarray(mg), jnp.asarray(bg)
    nfg = jnp.where(trackers.shift_init, alpha * fg + (1 - alpha) * trackers.fg, fg)
    nmg = jnp.where(trackers.shift_init, alpha * mg + (1 - alpha) * trackers.mg, mg)
    nbg = jnp.where(trackers.shift_init, alpha * bg + (1 - alpha) * trackers.bg, bg)
    return (
        trackers.replace(fg=nfg, mg=nmg, bg=nbg, shift_init=jnp.asarray(True)),
        (nfg, nmg, nbg),
    )


def floating_window_update(
    trackers: StereoTrackers, current_offset: jnp.ndarray, alpha=0.97, threshold=0.0015
) -> tuple[StereoTrackers, jnp.ndarray]:
    prev = trackers.fw_offset
    delta = jnp.abs(current_offset - prev)
    small = delta < threshold
    updated = alpha * prev + (1 - alpha) * current_offset
    counter = trackers.fw_counter + 1
    clamp_now = counter >= 100
    updated = jnp.where(clamp_now, jnp.clip(updated, -1.0, 1.0), updated)
    counter = jnp.where(clamp_now, 0, counter)
    new_offset = jnp.where(small, prev, updated)
    new_counter = jnp.where(small, trackers.fw_counter, counter)
    return trackers.replace(fw_offset=new_offset, fw_counter=new_counter), new_offset


def bar_easer_update(
    trackers: StereoTrackers, current_width: jnp.ndarray, alpha=0.85
) -> tuple[StereoTrackers, jnp.ndarray]:
    eased = jnp.floor(alpha * trackers.bar_width + (1 - alpha) * current_width)
    return trackers.replace(bar_width=eased), eased


def focal_tracker_update(
    trackers: StereoTrackers,
    candidate: jnp.ndarray,
    motion: jnp.ndarray,
    deadband=0.03,
    max_step=0.02,
) -> tuple[StereoTrackers, jnp.ndarray]:
    alpha = 0.10 + 0.20 * jnp.clip(motion, 0.0, 1.0)
    focal = trackers.focal
    c = jnp.where(jnp.abs(candidate - focal) < deadband, focal, candidate)
    new_focal = (1.0 - alpha) * focal + alpha * c
    step = jnp.clip(new_focal - focal, -max_step, max_step)
    new_focal = jnp.clip(focal + step, 0.0, 1.0)
    out = jnp.where(trackers.focal_init, new_focal, candidate)
    return trackers.replace(focal=out, focal_init=jnp.asarray(True)), out
