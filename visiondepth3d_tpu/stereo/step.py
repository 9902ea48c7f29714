"""The fused per-frame DIBR step and the batched ``lax.scan`` driver.

This is the TPU re-design of the reference's hot path
(render_sbs_3d per-frame loop, render_3d.py:1194-1464 + pixel_shift_cuda,
render_3d.py:561-712). The reference crosses the host<->device boundary 4-6x
per frame; here the entire chain — temporal smoothing, percentile EMA
normalization, pop shaping, subject lock, disparity warp, feathering,
healing, DOF, color grade, floating-window masks, sharpening — is ONE traced
function. A whole chunk of frames runs as a single ``lax.scan`` on device,
carrying the EMA tracker pytree, and only u8 frames cross PCIe at the chunk
boundary.

Stage order is exactly the reference loop's (see SURVEY.md §3.1); per-stage
reference citations live on the ops modules.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import convert, dof, edges, filters, formats, grade, subject, warp
from ..ops.depth_shaping import enhance_curvature, shape_depth_for_pop
from ..state import trackers as trk
from .params import StereoParams


class StereoFrameOut(NamedTuple):
    left: jnp.ndarray  # [H, W, 3] float RGB in [0, 1]
    right: jnp.ndarray
    shift_map: jnp.ndarray  # [H, W] normalized disparity actually applied
    subject_depth: jnp.ndarray  # scalar, post-shaping subject estimate
    focal_depth: jnp.ndarray  # scalar, stabilized DOF focal plane


def _maybe_quantize(x: jnp.ndarray, p: StereoParams) -> jnp.ndarray:
    """Reproduce the reference's u8 host round-trips in parity mode."""
    return convert.quantize_u8(x) if p.parity_quantize else x


def compute_shift_map(
    p: StereoParams,
    t: trk.StereoTrackers,
    shaped: jnp.ndarray,
    subject_depth: jnp.ndarray,
    fg: jnp.ndarray,
    mg: jnp.ndarray,
    bg: jnp.ndarray,
) -> tuple[trk.StereoTrackers, jnp.ndarray]:
    """Layer-weighted disparity with subject-anchored zero parallax
    (pixel_shift_cuda render_3d.py:619-682)."""
    width = shaped.shape[-1]
    half_width = width / 2.0

    fg_weight = jnp.clip((1.0 - shaped) ** 1.5, 0.0, 1.0)
    mg_weight = jnp.clip(1.0 - jnp.abs(shaped - p.depth_pop_mid) * 3.0, 0.0, 1.0)
    bg_weight = jnp.clip(shaped, 0.0, 1.0)

    raw_shift = (
        fg_weight * fg * p.fg_pop_multiplier
        + mg_weight * mg
        + bg_weight * bg * p.bg_push_multiplier
    )
    total_shift = (raw_shift * p.parallax_balance) / half_width

    if p.use_subject_tracking:
        adjusted = subject_depth * p.parallax_balance
        zero_parallax_offset = (
            (-adjusted * fg * p.fg_pop_multiplier)
            + (-adjusted * mg)
            + (adjusted * bg * p.bg_push_multiplier)
        ) / half_width
        zero_parallax_offset = zero_parallax_offset * p.subject_lock_strength
        zero_parallax_offset = zero_parallax_offset - p.zero_parallax_strength
        if p.enable_floating_window:
            subject_weight = jnp.clip(1.0 - subject_depth * 2.0, 0.5, 1.0)
            zero_parallax_offset = zero_parallax_offset * subject_weight
            zero_parallax_offset = jnp.clip(zero_parallax_offset, -0.35, 0.35)
            t, zero_parallax_offset = trk.floating_window_update(
                t, zero_parallax_offset, alpha=0.97, threshold=0.0015
            )
        total_shift = total_shift - zero_parallax_offset

    max_shift_norm = (width * p.max_pixel_shift_percent) / half_width
    total_shift = jnp.clip(total_shift, -max_shift_norm, max_shift_norm)

    # convergence bias: dynamic uses the shaped-depth subject estimate; a
    # strength of exactly 0 is a no-op either way (matches the reference's
    # `if convergence_strength != 0.0` fast path, render_3d.py:661-671)
    if p.enable_dynamic_convergence:
        convergence_bias = subject_depth * p.convergence_strength
    else:
        convergence_bias = jnp.asarray(p.convergence_strength)
    total_shift = total_shift - convergence_bias / half_width

    if p.enable_edge_masking:
        mask_strength = jnp.clip(p.feather_strength / 10.0, 0.05, 0.3)
        suppressed = edges.suppress_artifacts_with_edge_mask(
            shaped, total_shift, p.feather_strength
        )
        final_shift = (1.0 - mask_strength) * total_shift + mask_strength * suppressed
    else:
        final_shift = total_shift
    return t, final_shift


def _dispatch_warp(p: StereoParams, frame, shaped, final_shift):
    """Pick the warp implementation (ops/warp.py vs the Pallas kernel).

    "auto": the fused Pallas kernel on TPU when a static disparity bound is
    known (measured 3.1 ms/frame at 1080p vs 4.0 XLA shifted-acc vs 33
    gather), XLA shifted-acc with a bound elsewhere, general gather last.
    """
    import jax

    backend = p.warp_backend
    if backend == "auto":
        # non-128-multiple widths (Half-SBS eyes at 960, tiny tests) are
        # lane-padded inside stereo_warp_pallas — Mosaic's rotate cannot
        # legalize on padded vectors, so the kernel pads explicitly
        if p.max_shift_px_bound is not None and jax.default_backend() == "tpu":
            backend = "pallas"
        elif p.max_shift_px_bound is not None:
            backend = "xla"
        else:
            backend = "gather"
    if backend == "pallas":
        from ..ops.pallas_warp import stereo_warp_pallas

        return stereo_warp_pallas(frame, shaped, final_shift,
                                  p.max_shift_px_bound)
    if backend == "xla":
        return warp.stereo_warp(frame, shaped, final_shift, p.max_shift_px_bound)
    return warp.stereo_warp(frame, shaped, final_shift, None)


def pixel_shift(
    p: StereoParams,
    t: trk.StereoTrackers,
    frame: jnp.ndarray,
    depth: jnp.ndarray,
) -> tuple[trk.StereoTrackers, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The DIBR core (pixel_shift_cuda parity). frame: [H, W, 3], depth: [H, W].

    Returns (trackers, left, right, shift_map, subject_depth).
    """
    if p.warp_hw is not None and tuple(p.warp_hw) != frame.shape[:2]:
        from ..ops.resize import resize_bilinear

        frame = resize_bilinear(frame, tuple(p.warp_hw))
        depth = resize_bilinear(depth, tuple(p.warp_hw))
    if p.enable_curvature:
        depth = enhance_curvature(depth, p.curvature_strength)
    depth = jnp.clip(depth, 0.0, 1.0)

    subj_raw = subject.estimate_subject_depth(depth, p.quantile_mode)
    shaped = shape_depth_for_pop(
        depth,
        subj_raw,
        stretch_lo=p.depth_stretch_lo,
        stretch_hi=p.depth_stretch_hi,
        depth_mid=p.depth_pop_mid,
        gamma=p.depth_pop_gamma,
        quantile_mode=p.quantile_mode,
    )
    subject_depth = subject.estimate_subject_depth(shaped, p.quantile_mode)

    t, final_shift = compute_shift_map(p, t, shaped, subject_depth, p.fg_shift,
                                       p.mg_shift, p.bg_shift)
    # image-plane ops run in p.image_dtype (bf16 perf mode); the shift map
    # and all depth statistics above stay f32
    img_dt = jnp.dtype(p.image_dtype)
    frame_i = frame.astype(img_dt)
    left, right, dleft, dright = _dispatch_warp(
        p, frame_i, shaped.astype(img_dt), final_shift
    )

    left, right = _dispatch_postfx(p, left, right, frame_i, dleft, dright)
    return t, left, right, final_shift, subject_depth


def _dispatch_postfx(p: StereoParams, left, right, frame_i, dleft, dright):
    """Feather + heal: the fused Pallas kernel runs the whole post-fx chain
    for both eyes in one VMEM pass (ops/pallas_postfx.py); the XLA path is
    the op-by-op reference implementation (ops/edges.py)."""
    if not (p.enable_feathering or p.enable_healing):
        return left, right
    backend = p.postfx_backend
    if backend == "auto":
        import jax

        h = left.shape[0]
        backend = ("pallas" if jax.default_backend() == "tpu"
                   and h % 8 == 0 else "xla")
    if backend == "pallas":
        from ..ops.pallas_postfx import feather_heal_pallas, pick_block_rows

        h = left.shape[0]
        bh = pick_block_rows(h, left.shape[1], left.dtype)
        return feather_heal_pallas(
            left, right, frame_i, dleft, dright,
            blur_ksize=p.blur_ksize,
            feather_strength=p.feather_strength,
            heal_strength=p.heal_strength,
            enable_feathering=p.enable_feathering,
            enable_healing=p.enable_healing,
            block_rows=bh,
        )
    if p.enable_feathering:
        left = edges.feather_shift_edges(
            left, frame_i, dleft, p.blur_ksize, p.feather_strength
        )
        right = edges.feather_shift_edges(
            right, frame_i, dright, p.blur_ksize, p.feather_strength
        )
    if p.enable_healing:
        left = edges.heal_missing_pixels(left, frame_i, None, p.heal_strength)
        right = edges.heal_missing_pixels(right, frame_i, None, p.heal_strength)
    return left, right


def stereo_frame_step(
    p: StereoParams,
    t: trk.StereoTrackers,
    frame: jnp.ndarray,
    depth01: jnp.ndarray,
    is_blank: jnp.ndarray | None = None,
) -> tuple[trk.StereoTrackers, StereoFrameOut]:
    """One full frame through the stereo stage (render loop body parity).

    frame: [H, W, 3] float RGB in [0, 1] at working resolution;
    depth01: [H, W] float in [0, 1]; is_blank: optional scalar bool — blank
    frames pass the source through both eyes and freeze the warp-side
    trackers, exactly like the reference's blank-skip branch
    (render_3d.py:1278-1281).
    """
    t_in = t

    # 1) temporal EMA + percentile normalization (render_3d.py:1266-1267)
    t, depth_s = trk.temporal_depth_smooth(t, depth01, alpha=0.5)
    t, depth_n = trk.percentile_ema_normalize(
        t, depth_s, 0.02, 0.98, 0.92, p.quantile_mode
    )

    # 2) shift smoothing + dynamic parallax + IPD (render_3d.py:1269-1308)
    t, (fg, mg, bg) = trk.shift_smoother_update(
        t, p.fg_shift, p.mg_shift, p.bg_shift, alpha=0.15
    )
    if p.enable_dynamic_parallax:
        dyn = subject.dynamic_parallax_scale(depth_n, 0.90, 1.15)
    else:
        dyn = jnp.asarray(1.0, depth_n.dtype)
    ipd = jnp.where(p.ipd_factor == 0.0, 1.0, p.ipd_factor)
    fg, mg, bg = fg * dyn * ipd, mg * dyn * ipd, bg * dyn * ipd

    # 3) DIBR warp (pixel_shift_cuda) — outputs live at the warp resolution
    p_shift = p.replace(fg_shift=fg, mg_shift=mg, bg_shift=bg)
    t, left, right, shift_map, subj = pixel_shift(p_shift, t, frame, depth_n)
    left = _maybe_quantize(left, p)
    right = _maybe_quantize(right, p)
    warp_hw = left.shape[:2]
    if warp_hw != frame.shape[:2]:
        from ..ops.resize import resize_bilinear

        frame_w = resize_bilinear(frame, warp_hw)
        depth_w = resize_bilinear(depth_n, warp_hw)
    else:
        frame_w, depth_w = frame, depth_n

    # 4) motion-aware focal tracking + DOF (render_3d.py:1334-1356)
    candidate_focal = subject.estimate_subject_depth(depth_n, p.quantile_mode)
    motion = jnp.where(
        t.initialized,
        subject.motion_metric(t_in.prev_norm_depth, depth_n),
        jnp.asarray(0.0, depth_n.dtype),
    )
    t, focal = trk.focal_tracker_update(t, candidate_focal, motion)
    graded = False
    if p.dof_strength > 0.0:
        # depth is resized to the warped-frame size for DOF (render_3d.py:1347)
        import jax as _jax

        from ..ops import pallas_dof as _pdof
        from ..ops.pallas_dof import dof_grade_pallas, dof_reach

        # Fused kernel measured a WASH at 4K (14.96 vs 14.76 ms/frame
        # full stereo stage): the XLA LOD stack is HBM-bound at ~3.2 ms
        # but the kernel pays the same in VPU tap work. Off by default;
        # see benchmarks/RESULTS.md.
        use_fused = (
            _pdof.USE_FUSED_DOF
            and _jax.default_backend() == "tpu"
            and not p.parity_quantize  # parity mode keeps op-by-op order
            and dof_reach(p.dof_strength, p.dof_levels) <= 8
            and left.shape[0] % 8 == 0
        )
        if use_fused:
            # one VMEM pass for DOF + grade, both eyes (XLA runs the LOD
            # blur stack HBM-bound: 3.2 ms/frame at 4K, stereo4k_split.py)
            left, right = dof_grade_pallas(
                left, right, depth_w, focal, p.dof_strength,
                p.dof_focus_width, p.dof_levels,
                saturation=p.color_saturation, contrast=p.color_contrast,
                brightness=p.color_brightness,
            )
            graded = True
        else:
            left = dof.apply_dof(
                left, depth_w, focal, p.dof_strength, p.dof_focus_width,
                p.dof_levels
            )
            right = dof.apply_dof(
                right, depth_w, focal, p.dof_strength, p.dof_focus_width,
                p.dof_levels
            )

    # 5) color grade (render_3d.py:1362-1386)
    if not graded:
        left = grade.apply_color_grade(
            left, p.color_saturation, p.color_contrast, p.color_brightness
        )
        right = grade.apply_color_grade(
            right, p.color_saturation, p.color_contrast, p.color_brightness
        )
    left = _maybe_quantize(left, p)
    right = _maybe_quantize(right, p)

    # blank-frame passthrough: source in both eyes, warp-side trackers frozen
    if is_blank is not None:
        blank = is_blank
        left = jnp.where(blank, frame_w.astype(left.dtype), left)
        right = jnp.where(blank, frame_w.astype(right.dtype), right)
        t = t.replace(
            fw_offset=jnp.where(blank, t_in.fw_offset, t.fw_offset),
            fw_counter=jnp.where(blank, t_in.fw_counter, t.fw_counter),
            focal=jnp.where(blank, t_in.focal, t.focal),
            focal_init=jnp.where(blank, t_in.focal_init, t.focal_init),
        )

    # 6) floating-window side masks (render_3d.py:1389-1403). The subject
    # estimate here is on the same normalized depth as the focal candidate;
    # bar geometry uses the warp-stage width (the loop's resized_width).
    width = left.shape[1]
    subj_window = candidate_focal
    raw_zero = (-subj_window * fg - subj_window * mg + subj_window * bg) / (
        width / 2.0 + 1e-6
    )
    t, stable_zero = trk.convergence_ema_update(t, raw_zero, alpha=0.97)
    if p.enable_floating_window and p.use_subject_tracking:
        raw_bar = jnp.floor(jnp.abs(stable_zero) * width * 0.75)
        t, eased = trk.bar_easer_update(t, raw_bar, alpha=0.85)
        bar_width = jnp.clip(eased, 0.0, 80.0)
        side_sign = jnp.where(
            stable_zero > 0.005, 1, jnp.where(stable_zero < -0.005, -1, 0)
        )
        left = formats.apply_side_mask(left, bar_width, side_sign)
        right = formats.apply_side_mask(right, bar_width, side_sign)

    # 7) sharpen (render_3d.py:1406-1407)
    left = filters.sharpen(left, p.sharpness_factor)
    right = filters.sharpen(right, p.sharpness_factor)
    left = _maybe_quantize(left, p)
    right = _maybe_quantize(right, p)

    # record this frame's normalized depth for the next motion metric
    t = t.replace(prev_norm_depth=depth_n, initialized=jnp.asarray(True))
    return t, StereoFrameOut(left, right, shift_map, subj, focal)


def render_chunk(
    p: StereoParams,
    t: trk.StereoTrackers,
    frames: jnp.ndarray,
    depths: jnp.ndarray,
    blanks: jnp.ndarray | None = None,
) -> tuple[trk.StereoTrackers, StereoFrameOut]:
    """Scan the stereo step over a [T, H, W, 3] chunk of frames.

    The EMA trackers force sequential semantics (the reference is strictly
    serial); ``lax.scan`` keeps the whole chunk on device as one compiled
    loop. Data parallelism happens a level up: independent scans over
    contiguous video segments on different mesh devices (parallel/).
    """

    def body(carry, inputs):
        if blanks is None:
            frame, depth = inputs
            blank = None
        else:
            frame, depth, blank = inputs
        carry, out = stereo_frame_step(p, carry, frame, depth, blank)
        return carry, out

    xs = (frames, depths) if blanks is None else (frames, depths, blanks)
    return lax.scan(body, t, xs)
