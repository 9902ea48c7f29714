"""Stereo op parity vs independent torch transcriptions of the documented
reference formulas (SURVEY.md §2.1 is the spec; exact quantile mode used so
differences isolate real math errors, not histogram approximation)."""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from visiondepth3d_tpu.ops import (
    apply_color_grade,
    apply_dof,
    anaglyph_red_cyan,
    disparity_warp,
    enhance_curvature,
    estimate_subject_depth,
    feather_shift_edges,
    heal_missing_pixels,
    interlaced,
    shape_depth_for_pop,
    signed_pow,
    stereo_warp,
    suppress_artifacts_with_edge_mask,
    dynamic_parallax_scale,
    motion_metric,
)


# ---------- torch transcriptions (spec: render_3d.py formulas) ----------


def torch_subject_depth(d):
    _, H, W = d.shape
    crop = d[:, H // 5 : H * 4 // 5, W // 5 : W * 4 // 5]
    valid = crop[(crop > 0.05) & (crop < 0.95)]
    if valid.numel() < 20:
        return torch.tensor(0.5)
    hist = torch.histc(valid, bins=64, min=0.0, max=1.0)
    peak = torch.argmax(hist)
    subject = (peak.float() + 0.5) / 64
    med = torch.median(valid)
    return (0.7 * subject + 0.3 * med).clamp(0, 1)


def torch_shape_pop(d, subj, lo_q=0.05, hi_q=0.95, mid=0.5, gamma=0.85):
    d = d.clamp(0, 1)
    lo, hi = torch.quantile(d, lo_q), torch.quantile(d, hi_q)
    if (hi - lo) < 1e-5:
        ds = d
        ss = subj.clamp(0, 1)
    else:
        ds = ((d - lo) / (hi - lo + 1e-6)).clamp(0, 1)
        ss = ((subj.clamp(0, 1) - lo) / (hi - lo + 1e-6)).clamp(0, 1)
    centered = ds - ss + mid
    shaped = torch.sign(centered - mid) * (centered - mid).abs() ** gamma + mid
    return shaped.clamp(0, 1)


def torch_suppress(d, shift, feather=10.0, thr=0.02):
    dx = torch.abs(F.pad(d[:, :, 1:] - d[:, :, :-1], (1, 0)))
    dy = torch.abs(F.pad(d[:, 1:, :] - d[:, :-1, :], (0, 0, 1, 0)))
    gm = torch.sqrt(dx**2 + dy**2)
    mask = torch.sigmoid((gm - thr) * feather * 5)
    smooth = 1.0 - mask
    smooth = F.avg_pool2d(smooth.unsqueeze(0), 5, stride=1, padding=2).squeeze(0)
    return shift * smooth


def torch_feather(shifted, original, depth, k=7, strength=10.0):
    gx = F.pad(depth[:, :, 1:] - depth[:, :, :-1], (1, 0))
    gy = F.pad(depth[:, 1:, :] - depth[:, :-1, :], (0, 0, 1, 0))
    gm = torch.sqrt(gx**2 + gy**2)
    mask = torch.clamp(gm * strength, 0, 1)
    blurred = F.avg_pool2d(mask.unsqueeze(0), k, stride=1, padding=k // 2).squeeze(0)
    blend = blurred.repeat(3, 1, 1)
    return (shifted * (1 - blend) + original * blend).clamp(0, 1)


def torch_grid_sample_hshift(img_chw, shift_hw):
    C, H, W = img_chw.shape
    xx, yy = torch.meshgrid(
        torch.linspace(-1, 1, W), torch.linspace(-1, 1, H), indexing="xy"
    )
    grid = torch.stack((xx, yy), dim=-1)
    grid = grid.clone()
    grid[..., 0] += shift_hw
    return F.grid_sample(
        img_chw[None],
        grid[None],
        mode="bilinear",
        padding_mode="border",
        align_corners=True,
    )[0]


# ----------------------------- tests -----------------------------


def _j(x):
    return jnp.asarray(x)


def test_signed_pow():
    x = np.linspace(-1, 1, 31).astype(np.float32)
    ours = np.asarray(signed_pow(_j(x), 0.85))
    ref = np.sign(x) * np.abs(x) ** 0.85
    np.testing.assert_allclose(ours, ref, atol=5e-6)


def test_subject_depth_matches_torch(depth_ramp):
    ours = float(estimate_subject_depth(_j(depth_ramp), "exact"))
    ref = float(torch_subject_depth(torch.from_numpy(depth_ramp)[None]))
    assert abs(ours - ref) < 1e-6


def test_subject_depth_fallback():
    d = np.full((50, 50), 0.99, np.float32)  # all pixels outside validity band
    assert float(estimate_subject_depth(_j(d), "exact")) == 0.5


def test_subject_depth_hist_mode_close(depth_ramp):
    exact = float(estimate_subject_depth(_j(depth_ramp), "exact"))
    hist = float(estimate_subject_depth(_j(depth_ramp), "hist"))
    assert abs(exact - hist) < 2e-3


def test_shape_pop_matches_torch(depth_ramp):
    subj = float(estimate_subject_depth(_j(depth_ramp), "exact"))
    ours = np.asarray(
        shape_depth_for_pop(_j(depth_ramp), jnp.float32(subj), quantile_mode="exact")
    )
    ref = torch_shape_pop(
        torch.from_numpy(depth_ramp)[None], torch.tensor(subj)
    )[0].numpy()
    np.testing.assert_allclose(ours, ref, atol=5e-5)


def test_shape_pop_degenerate_range():
    d = np.full((32, 32), 0.4, np.float32)
    out = np.asarray(shape_depth_for_pop(_j(d), jnp.float32(0.4), quantile_mode="exact"))
    ref = torch_shape_pop(torch.full((1, 32, 32), 0.4), torch.tensor(0.4))[0].numpy()
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_curvature(depth_ramp):
    ours = np.asarray(enhance_curvature(_j(depth_ramp), 0.08))
    h, w = depth_ramp.shape
    yy, xx = np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, w), indexing="ij")
    ref = depth_ramp + (1 - (xx**2 + yy**2)) * 0.08
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_suppress_matches_torch(depth_ramp):
    shift = (0.01 * np.sin(np.arange(depth_ramp.size) / 7.0)).reshape(
        depth_ramp.shape
    ).astype(np.float32)
    ours = np.asarray(
        suppress_artifacts_with_edge_mask(_j(depth_ramp), _j(shift), 10.0)
    )
    ref = torch_suppress(
        torch.from_numpy(depth_ramp)[None], torch.from_numpy(shift)[None]
    )[0].numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_feather_matches_torch(rgb_frame, depth_ramp):
    shifted = np.roll(rgb_frame, 2, axis=1)
    ours = np.asarray(
        feather_shift_edges(_j(shifted), _j(rgb_frame), _j(depth_ramp), 7, 10.0)
    )
    ref = torch_feather(
        torch.from_numpy(np.moveaxis(shifted, -1, 0)),
        torch.from_numpy(np.moveaxis(rgb_frame, -1, 0)),
        torch.from_numpy(depth_ramp)[None],
    )
    ref = np.moveaxis(ref.numpy(), 0, -1)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_disparity_warp_matches_grid_sample(rgb_frame, depth_ramp):
    shift = (0.05 * (depth_ramp - 0.5)).astype(np.float32)
    ours = np.asarray(disparity_warp(_j(rgb_frame), _j(shift)))
    ref = torch_grid_sample_hshift(
        torch.from_numpy(np.moveaxis(rgb_frame, -1, 0)), torch.from_numpy(shift)
    )
    ref = np.moveaxis(ref.numpy(), 0, -1)
    np.testing.assert_allclose(ours, ref, atol=5e-5)


def test_disparity_warp_border_clamp(rgb_frame):
    # huge shift: must clamp to frame edge, not wrap or zero-fill
    shift = np.full(rgb_frame.shape[:2], 3.0, np.float32)
    ours = np.asarray(disparity_warp(_j(rgb_frame), _j(shift)))
    ref = torch_grid_sample_hshift(
        torch.from_numpy(np.moveaxis(rgb_frame, -1, 0)),
        torch.from_numpy(shift),
    )
    np.testing.assert_allclose(ours, np.moveaxis(ref.numpy(), 0, -1), atol=5e-5)


def test_stereo_warp_left_right_symmetry(rgb_frame, depth_ramp):
    shift = (0.03 * (depth_ramp - 0.5)).astype(np.float32)
    left, right, dl, dr = stereo_warp(_j(rgb_frame), _j(depth_ramp), _j(shift))
    np.testing.assert_allclose(
        np.asarray(left), np.asarray(disparity_warp(_j(rgb_frame), _j(shift))), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(right),
        np.asarray(disparity_warp(_j(rgb_frame), _j(-shift))),
        atol=1e-6,
    )
    assert dl.shape == depth_ramp.shape and dr.shape == depth_ramp.shape


def test_color_grade_matches_torch(rgb_frame):
    ours = np.asarray(apply_color_grade(_j(rgb_frame), 1.3, 1.1, 0.05))
    r, g, b = [torch.from_numpy(rgb_frame[..., i]) for i in range(3)]
    luma = 0.2126 * r + 0.7152 * g + 0.0722 * b
    sat = torch.stack([luma + (c - luma) * 1.3 for c in (r, g, b)], -1)
    ref = (0.5 + (sat - 0.5) * 1.1 + 0.05).clamp(0, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_dof_identity_when_in_focus(rgb_frame):
    depth = np.full(rgb_frame.shape[:2], 0.5, np.float32)
    out = np.asarray(apply_dof(_j(rgb_frame), _j(depth), 0.5, max_sigma=2.0))
    np.testing.assert_allclose(out, np.clip(rgb_frame, 0, 1), atol=1e-6)


def test_dof_blurs_out_of_focus(rgb_frame):
    depth = np.full(rgb_frame.shape[:2], 1.0, np.float32)
    out = np.asarray(apply_dof(_j(rgb_frame), _j(depth), 0.0, max_sigma=2.0))
    # fully out of focus -> maximum blur level: variance must drop
    assert out.var() < rgb_frame.var() * 0.9


def test_heal_blends_original(rgb_frame):
    warped = np.roll(rgb_frame, 5, axis=1)
    out = np.asarray(heal_missing_pixels(_j(warped), _j(rgb_frame), None, 0.5))
    assert out.shape == rgb_frame.shape
    assert np.all(out >= 0) and np.all(out <= 1)
    # healing must move warped pixels toward the original in gradient areas
    d_before = np.abs(warped - rgb_frame).mean()
    d_after = np.abs(out - rgb_frame).mean()
    assert d_after < d_before


def test_anaglyph_formula(rgb_frame):
    right = np.roll(rgb_frame, 3, axis=1)
    out = np.asarray(anaglyph_red_cyan(_j(rgb_frame), _j(right)))
    l = rgb_frame
    red = 0.4561 * l[..., 0] + 0.5005 * l[..., 1] + 0.1762 * l[..., 2]
    np.testing.assert_allclose(out[..., 0], np.clip(red, 0, 1), atol=1e-6)


def test_interlaced(rgb_frame):
    right = np.roll(rgb_frame, 3, axis=1)
    out = np.asarray(interlaced(_j(rgb_frame), _j(right)))
    np.testing.assert_allclose(out[::2], rgb_frame[::2], atol=1e-7)
    np.testing.assert_allclose(out[1::2], right[1::2], atol=1e-7)


def test_dynamic_parallax_scale_matches_torch(depth_ramp):
    ours = float(dynamic_parallax_scale(_j(depth_ramp), 0.90, 1.15))
    d = torch.from_numpy(depth_ramp)[None]
    _, H, W = d.shape
    crop = d[:, H // 4 : H * 3 // 4, W // 4 : W * 3 // 4]
    nv = (torch.var(crop) / (torch.mean(crop) + 1e-5)).clamp(0, 1)
    ref = float(0.90 + nv * 0.25)
    assert abs(ours - ref) < 1e-6


def test_motion_metric(depth_ramp):
    nxt = np.clip(depth_ramp + 0.05, 0, 1).astype(np.float32)
    ours = float(motion_metric(_j(depth_ramp), _j(nxt)))
    ref = min(1.0, float(np.mean(np.abs(nxt - depth_ramp))) * 4.0)
    assert abs(ours - ref) < 1e-5


def test_shifted_acc_warp_matches_gather(rgb_frame, depth_ramp):
    shift = (0.05 * (depth_ramp - 0.5)).astype(np.float32)
    l1, r1, dl1, dr1 = stereo_warp(_j(rgb_frame), _j(depth_ramp), _j(shift))
    # 0.05 grid units * (W-1)/2 = ~4 px max; bound of 8 is safely above
    l2, r2, dl2, dr2 = stereo_warp(
        _j(rgb_frame), _j(depth_ramp), _j(shift), max_shift_px=8
    )
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), atol=2e-6)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r1), atol=2e-6)
    np.testing.assert_allclose(np.asarray(dl2), np.asarray(dl1), atol=2e-6)
    np.testing.assert_allclose(np.asarray(dr2), np.asarray(dr1), atol=2e-6)


def test_shifted_acc_warp_border_clamp(rgb_frame):
    shift = np.full(rgb_frame.shape[:2], 0.08, np.float32)  # ~6.4 px right
    ref = np.asarray(disparity_warp(_j(rgb_frame), _j(shift)))
    l2, _, _, _ = stereo_warp(
        _j(rgb_frame), _j(rgb_frame[..., 0]), _j(shift), max_shift_px=10
    )
    np.testing.assert_allclose(np.asarray(l2), ref, atol=2e-6)


def test_pallas_warp_matches_reference(rgb_frame, depth_ramp):
    """Fused Pallas dual-eye warp (interpret mode on CPU) vs the gather warp."""
    import jax

    from visiondepth3d_tpu.ops import pallas_warp as pw

    shift = (0.05 * (depth_ramp - 0.5)).astype(np.float32)
    ref = stereo_warp(_j(rgb_frame), _j(depth_ramp), _j(shift))
    with jax.disable_jit(False):
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            out = pw.stereo_warp_pallas(
                _j(rgb_frame), _j(depth_ramp), _j(shift), max_shift_px=8,
                block_rows=32,
            )
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_pallas_postfx_matches_edges_chain(rgb_frame, depth_ramp):
    """Fused feather+heal kernel (interpret mode) vs the op-by-op chain
    (ops/edges.py), including the image-border zero-pad semantics."""
    import jax

    from visiondepth3d_tpu.ops import edges
    from visiondepth3d_tpu.ops.pallas_postfx import feather_heal_pallas

    h, w = rgb_frame.shape[:2]
    assert h % 8 == 0
    rng = np.random.default_rng(1)
    left = np.clip(rgb_frame + 0.05 * rng.standard_normal(rgb_frame.shape),
                   0, 1).astype(np.float32)
    right = np.clip(rgb_frame - 0.05 * rng.standard_normal(rgb_frame.shape),
                    0, 1).astype(np.float32)
    dl = depth_ramp
    dr = np.roll(depth_ramp, 3, axis=1)

    ref_l = edges.feather_shift_edges(_j(left), _j(rgb_frame), _j(dl), 7, 10.0)
    ref_r = edges.feather_shift_edges(_j(right), _j(rgb_frame), _j(dr), 7, 10.0)
    ref_l = edges.heal_missing_pixels(ref_l, _j(rgb_frame), None, 0.5)
    ref_r = edges.heal_missing_pixels(ref_r, _j(rgb_frame), None, 0.5)

    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        out_l, out_r = feather_heal_pallas(
            _j(left), _j(right), _j(rgb_frame), _j(dl), _j(dr),
            blur_ksize=7, feather_strength=10.0, heal_strength=0.5,
            block_rows=8,
        )
    np.testing.assert_allclose(np.asarray(out_l), np.asarray(ref_l), atol=3e-6)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(ref_r), atol=3e-6)


def test_pallas_postfx_feather_only(rgb_frame, depth_ramp):
    import jax

    from visiondepth3d_tpu.ops import edges
    from visiondepth3d_tpu.ops.pallas_postfx import feather_heal_pallas

    ref = edges.feather_shift_edges(_j(rgb_frame), _j(rgb_frame),
                                    _j(depth_ramp), 5, 8.0)
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        out_l, _ = feather_heal_pallas(
            _j(rgb_frame), _j(rgb_frame), _j(rgb_frame), _j(depth_ramp),
            _j(depth_ramp), blur_ksize=5, feather_strength=8.0,
            enable_healing=False, block_rows=16,
        )
    np.testing.assert_allclose(np.asarray(out_l), np.asarray(ref), atol=3e-6)


def test_pallas_postfx_block_and_ksize_sweep(rng):
    """Granule-context scheme: parity vs the XLA chain across block sizes
    and the full legal blur_ksize range (stencil reach 5 + k//2 must fit
    the fixed 16-row context)."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from visiondepth3d_tpu.ops import edges
    from visiondepth3d_tpu.ops.pallas_postfx import feather_heal_pallas

    for h, w, bh, k in [(96, 160, 48, 15), (120, 128, 40, 11),
                        (64, 256, 32, 15), (80, 128, 16, 13)]:
        yy, xx = np.mgrid[0:h, 0:w]
        depth = np.clip(
            0.5 + 0.3 * np.sin(xx / 7.0) * np.cos(yy / 5.0)
            + 0.2 * (xx / w - 0.5), 0, 1
        ).astype(np.float32)
        frame = rng.random((h, w, 3), dtype=np.float32)
        left = np.clip(frame + 0.1 * rng.standard_normal(frame.shape),
                       0, 1).astype(np.float32)
        ref = edges.feather_shift_edges(
            _j(left), _j(frame), _j(depth), k, 10.0
        )
        ref = edges.heal_missing_pixels(ref, _j(frame), None, 0.5)
        with pltpu.force_tpu_interpret_mode():
            out, _ = feather_heal_pallas(
                _j(left), _j(left), _j(frame), _j(depth),
                _j(np.roll(depth, 2, axis=1)),
                blur_ksize=k, feather_strength=10.0, heal_strength=0.5,
                block_rows=bh,
            )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-6, err_msg=f"h={h} bh={bh} k={k}")


def test_pallas_warp_lane_padded_width(rgb_frame, depth_ramp):
    """Non-128-multiple widths lane-pad inside the kernel wrapper; the
    real-width clamp keeps border semantics identical to the XLA warp."""
    import jax

    from visiondepth3d_tpu.ops import pallas_warp as pw

    w = 60  # pads to 128 lanes
    frame = rgb_frame[:32, :w]
    depth = depth_ramp[:32, :w]
    shift = (0.08 * (depth - 0.5)).astype(np.float32)
    ref = stereo_warp(_j(frame), _j(depth), _j(shift))
    with jax.disable_jit(False):
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            out = pw.stereo_warp_pallas(
                _j(frame), _j(depth), _j(shift), max_shift_px=6,
                block_rows=16,
            )
    for a, b in zip(out, ref):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_bilateral_smooth_depth_matches_cv2(depth_ramp):
    cv2 = __import__("pytest").importorskip("cv2")
    from visiondepth3d_tpu.ops.filters import bilateral_smooth_depth

    rng = np.random.default_rng(7)
    d = np.clip(depth_ramp + 0.08 * rng.standard_normal(depth_ramp.shape),
                0.0, 1.0).astype(np.float32)
    d_u8 = np.round(d * 255.0).astype(np.uint8)
    ref = cv2.bilateralFilter(d_u8, d=9, sigmaColor=75, sigmaSpace=75)
    # feed the exact u8 grid so the only deltas are accumulation order +
    # cv2's output rounding
    ours = np.asarray(bilateral_smooth_depth(jnp.asarray(d_u8 / 255.0)))
    assert np.abs(ours * 255.0 - ref.astype(np.float32)).max() <= 1.0


def test_bilateral_smooth_depth_preserves_edges():
    from visiondepth3d_tpu.ops.filters import bilateral_smooth_depth

    d = np.zeros((32, 64), np.float32)
    d[:, 32:] = 1.0  # hard edge
    out = np.asarray(bilateral_smooth_depth(jnp.asarray(d)))
    # bilateral must NOT wash the edge out: values stay near 0/1 either side
    assert out[:, :30].max() < 0.02 and out[:, 34:].min() > 0.98
