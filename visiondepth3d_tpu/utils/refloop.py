"""Reference-oracle harness: runs the ACTUAL reference stereo chain.

/root/reference/core/render_3d.py is imported (torch CPU) and its own stage
objects — TemporalDepthFilter, DepthPercentileEMA, ShiftSmoother,
compute_dynamic_parallax_scale, pixel_shift_cuda, FocalDepthTracker,
apply_color_grade, ConvergenceEMA + FloatingBarEaser + apply_side_mask,
apply_sharpening — are invoked in the exact render_sbs_3d order
(render_3d.py:1261-1407) over a synthetic clip, giving a ground-truth
oracle to SSIM our ``stereo_frame_step`` against.

Used by BOTH tests/test_reference_oracle.py (the >=0.99 parity gate) and
bench.py (the shipped-configuration quality number emitted next to the
headline fps). Heavy deps (torch, cv2, the reference tree) are imported
lazily; callers must handle ImportError/FileNotFoundError when the
reference or torch is unavailable.

Missing heavyweight deps of the reference module are shimmed: onnxruntime
is imported but unused on this path; torchvision only provides
gaussian_blur for DOF (apply_dof_cuda, render_3d.py:769-834), which gets a
faithful torch implementation below (same normalized-pdf separable kernel,
reflect padding) so the DOF stage runs as part of the oracle chain.
"""

from __future__ import annotations

import sys
import types

import numpy as np

REF_RENDER3D = "/root/reference/core/render_3d.py"


def load_reference_render3d():
    """Import the reference's render_3d module with dependency shims."""
    import importlib.machinery as machinery
    import importlib.util

    if "onnxruntime" not in sys.modules:
        stub = types.ModuleType("onnxruntime")
        stub.get_device = lambda: "CPU"
        stub.__spec__ = machinery.ModuleSpec("onnxruntime", loader=None)
        sys.modules["onnxruntime"] = stub
    if "torchvision" not in sys.modules:
        import torch

        tv = types.ModuleType("torchvision")
        tf = types.ModuleType("torchvision.transforms")
        tff = types.ModuleType("torchvision.transforms.functional")
        for mod in (tv, tf, tff):
            mod.__spec__ = machinery.ModuleSpec(mod.__name__, loader=None)

        def _tv_gaussian_blur(img, kernel_size, sigma):
            """Faithful torchvision.transforms.functional.gaussian_blur
            for [C, H, W] float tensors: 1-D kernel = normalized Gaussian
            pdf sampled on [-half, half], separable conv2d with reflect
            padding — the exact semantics apply_dof_cuda relies on."""
            import torch.nn.functional as F

            k = kernel_size if isinstance(kernel_size, int) else kernel_size[0]
            s = float(sigma[0] if isinstance(sigma, (list, tuple)) else sigma)
            half = (k - 1) * 0.5
            xs = torch.linspace(-half, half, steps=k)
            pdf = torch.exp(-0.5 * (xs / s) ** 2)
            k1 = (pdf / pdf.sum()).to(img.dtype)
            c = img.shape[0]
            out = F.pad(img.unsqueeze(0), [k // 2] * 4, mode="reflect")
            out = F.conv2d(out, k1.view(1, 1, 1, k).expand(c, 1, 1, k),
                           groups=c)
            out = F.conv2d(out, k1.view(1, 1, k, 1).expand(c, 1, k, 1),
                           groups=c)
            return out.squeeze(0)

        tff.gaussian_blur = _tv_gaussian_blur
        tf.functional = tff
        tv.transforms = tf
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tf
        sys.modules["torchvision.transforms.functional"] = tff

    # Load render_3d.py directly: the real core/__init__.py pulls in
    # render_depth/merged_pipeline, which need diffusers — not installed
    # and not needed for this oracle.
    if "core.render_3d" not in sys.modules:
        pkg = types.ModuleType("core")
        pkg.__path__ = ["/root/reference/core"]
        pkg.__spec__ = machinery.ModuleSpec("core", loader=None,
                                            is_package=True)
        sys.modules["core"] = pkg
        spec = importlib.util.spec_from_file_location(
            "core.render_3d", REF_RENDER3D
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules["core.render_3d"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["core.render_3d"]


def ssim(a: np.ndarray, b: np.ndarray, win: int = 7) -> float:
    """Windowed luma SSIM between two [H, W, 3] float01 images."""

    def luma(x):
        return 0.2126 * x[..., 0] + 0.7152 * x[..., 1] + 0.0722 * x[..., 2]

    x, y = luma(a).astype(np.float64), luma(b).astype(np.float64)
    from numpy.lib.stride_tricks import sliding_window_view

    xw = sliding_window_view(x, (win, win))
    yw = sliding_window_view(y, (win, win))
    mx, my = xw.mean(axis=(-1, -2)), yw.mean(axis=(-1, -2))
    vx, vy = xw.var(axis=(-1, -2)), yw.var(axis=(-1, -2))
    cov = (xw * yw).mean(axis=(-1, -2)) - mx * my
    c1, c2 = 0.01**2, 0.03**2
    s = ((2 * mx * my + c1) * (2 * cov + c2)) / (
        (mx**2 + my**2 + c1) * (vx + vy + c2)
    )
    return float(s.mean())


def make_clip(t: int = 6, hw: tuple[int, int] = (256, 448)):
    """Synthetic moving-subject clip: textured background, depth ramp,
    near-depth red box tracking across frames."""
    H, W = hw
    yy, xx = np.mgrid[0:H, 0:W]
    frames, depths = [], []
    for i in range(t):
        f = np.zeros((H, W, 3), np.float32)
        f[..., 0] = 0.5 + 0.4 * np.sin(xx / 11.0 + i * 0.3)
        f[..., 1] = 0.5 + 0.4 * np.cos(yy / 7.0)
        f[..., 2] = 0.5 + 0.2 * np.sin((xx + yy) / 17.0)
        x0 = 20 + 6 * i
        f[30:70, x0 : x0 + 30] = [0.9, 0.2, 0.2]
        d = (0.3 + 0.5 * xx / W).astype(np.float32)
        d[30:70, x0 : x0 + 30] = 0.15
        frames.append(np.clip(np.round(f * 255), 0, 255).astype(np.uint8))
        depths.append(np.clip(np.round(d * 255), 0, 255).astype(np.uint8))
    return frames, depths


class ReferenceLoop:
    """render_sbs_3d's per-frame body, built ONLY from reference callables
    and classes (render_3d.py:1261-1407), including the DOF branch."""

    def __init__(self, r3d, p, hw: tuple[int, int] = (256, 448)):
        self.r = r3d
        self.p = p
        self.H, self.W = hw
        self.temporal = r3d.TemporalDepthFilter(alpha=0.5)
        self.ema = r3d.DepthPercentileEMA(p_lo=0.02, p_hi=0.98, alpha=0.92)
        self.smoother = r3d.ShiftSmoother(0.15)
        self.focal = r3d.FocalDepthTracker(alpha=0.15, deadband=0.03,
                                           max_step=0.02)
        self.conv_ema = r3d.ConvergenceEMA(alpha=0.97)
        self.bar_easer = r3d.FloatingBarEaser(alpha=0.85)
        self.prev_depth = None

    def frame(self, frame_u8_rgb, depth_u8):
        r, p, W = self.r, self.p, self.W
        frame_bgr = frame_u8_rgb[..., ::-1].copy()  # cv2-style input
        ft = r.frame_to_tensor(frame_bgr)  # -> RGB float [3,H,W]
        dt = r.depth_to_tensor(np.repeat(depth_u8[..., None], 3, -1))

        dt = self.temporal.smooth(dt)
        dt = self.ema.normalize(dt)
        fg, mg, bg = self.smoother.smooth(
            float(p.fg_shift), float(p.mg_shift), float(p.bg_shift)
        )
        dyn = r.compute_dynamic_parallax_scale(dt, min_scale=0.90,
                                               max_scale=1.15)
        fg, mg, bg = fg * dyn, mg * dyn, bg * dyn

        left, right = r.pixel_shift_cuda(
            ft, dt, W, self.H, fg, mg, bg,
            blur_ksize=int(p.blur_ksize),
            feather_strength=float(p.feather_strength),
            use_subject_tracking=True,
            enable_floating_window=True,
            return_shift_map=False,
            max_pixel_shift_percent=float(p.max_pixel_shift_percent),
            zero_parallax_strength=float(p.zero_parallax_strength),
            enable_edge_masking=True,
            enable_feathering=True,
            dof_strength=0.0,
            convergence_strength=float(p.convergence_strength),
            enable_dynamic_convergence=True,
            depth_pop_gamma=0.85, depth_pop_mid=0.50,
            depth_stretch_lo=0.05, depth_stretch_hi=0.95,
            fg_pop_multiplier=1.20, bg_push_multiplier=1.10,
            subject_lock_strength=1.00,
        )

        cand = r.estimate_subject_depth(dt)
        motion = r.compute_motion_metric(self.prev_depth, dt)
        self.focal.set_scene_motion(motion)
        focal_depth = self.focal.update(cand)

        left_t = r.frame_to_tensor(left)
        right_t = r.frame_to_tensor(right)
        if float(p.dof_strength) > 0.0:
            # DOF branch exactly as render_3d.py:1340-1356: depth resized
            # to the warped-frame size, stabilized focal, focus_width 0.35
            import torch.nn.functional as F

            hh, ww = left_t.shape[1], left_t.shape[2]
            depth_for_dof = F.interpolate(
                dt.unsqueeze(0), size=(hh, ww), mode="bilinear",
                align_corners=False,
            ).squeeze(0)
            left_t = r.apply_dof_cuda(left_t, depth_for_dof, focal_depth,
                                      max_sigma=float(p.dof_strength),
                                      focus_width=0.35)
            right_t = r.apply_dof_cuda(right_t, depth_for_dof, focal_depth,
                                       max_sigma=float(p.dof_strength),
                                       focus_width=0.35)
        lt = r.apply_color_grade(left_t,
                                 saturation=float(p.color_saturation),
                                 contrast=float(p.color_contrast),
                                 brightness=float(p.color_brightness))
        rt = r.apply_color_grade(right_t,
                                 saturation=float(p.color_saturation),
                                 contrast=float(p.color_contrast),
                                 brightness=float(p.color_brightness))
        left, right = r.tensor_to_frame(lt), r.tensor_to_frame(rt)

        subject = r.estimate_subject_depth(dt)
        raw_zero = float(((-subject * fg) + (-subject * mg) + (subject * bg))
                         / (W / 2 + 1e-6))
        stable = self.conv_ema.update(raw_zero)
        raw_bar = int(abs(stable) * W * 0.75)
        bar = max(min(self.bar_easer.ease(raw_bar), 80), 0)
        if stable > 0.005:
            left = r.apply_side_mask(left, side="right", width=bar)
            right = r.apply_side_mask(right, side="right", width=bar)
        elif stable < -0.005:
            left = r.apply_side_mask(left, side="left", width=bar)
            right = r.apply_side_mask(right, side="left", width=bar)

        left = r.apply_sharpening(left, float(p.sharpness_factor))
        right = r.apply_sharpening(right, float(p.sharpness_factor))
        self.prev_depth = dt.detach()
        # back to RGB float01 for comparison
        return (left[..., ::-1].astype(np.float32) / 255.0,
                right[..., ::-1].astype(np.float32) / 255.0)


def worst_ssim_vs_reference(params, t: int = 6,
                            hw: tuple[int, int] = (256, 448)) -> float:
    """Run the synthetic clip through BOTH the actual reference chain and
    our ``stereo_frame_step`` under ``params``; return the worst per-eye
    SSIM across the clip. ``params`` carries the configuration under test
    (quantile mode, image dtype, warp/postfx backend, healing, ...); the
    user-content knobs (shifts, blur, DOF, grade) drive both sides."""
    import jax.numpy as jnp

    from ..state import init_trackers
    from ..stereo.step import stereo_frame_step

    r3d = load_reference_render3d()
    frames, depths = make_clip(t=t, hw=hw)
    oracle = ReferenceLoop(r3d, params, hw=hw)
    trackers = init_trackers(*hw)
    worst = 1.0
    for f_u8, d_u8 in zip(frames, depths):
        ref_l, ref_r = oracle.frame(f_u8, d_u8)
        trackers, out = stereo_frame_step(
            params, trackers,
            jnp.asarray(f_u8.astype(np.float32) / 255.0),
            jnp.asarray(d_u8.astype(np.float32) / 255.0),
        )
        sl = ssim(np.asarray(out.left, dtype=np.float32), ref_l)
        sr = ssim(np.asarray(out.right, dtype=np.float32), ref_r)
        worst = min(worst, sl, sr)
    return worst


def _main():
    """CPU-subprocess entry for bench.py: measure the SHIPPED stereo
    configuration's SSIM against the actual reference and print one JSON
    line. Runs on the CPU backend — the un-jitted per-frame step dispatched
    eagerly through the TPU relay would take minutes per frame, and the
    number is backend-independent (the dispatched warp/postfx backends are
    exercised on TPU by tests; hist/bf16/no-quantize numerics are the
    configuration under test)."""
    import json

    import jax

    jax.config.update("jax_platforms", "cpu")

    from ..stereo import StereoParams

    w = 448
    p = StereoParams(enable_healing=True, image_dtype="bfloat16",
                     blur_ksize=7, dof_strength=1.5).with_shift_bound(w)
    print(json.dumps({"ssim_vs_ref": round(
        worst_ssim_vs_reference(p, hw=(256, w)), 4)}))


if __name__ == "__main__":
    _main()
