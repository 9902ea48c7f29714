"""Golden parity: the full stereo frame chain vs an independent torch
implementation of the reference's documented math (SURVEY.md §2.1 formulas),
scored with SSIM — the BASELINE.md acceptance metric (SSIM >= 0.99).

The torch side re-implements, from the documented formulas: temporal EMA,
percentile EMA normalization, shift smoothing, dynamic parallax, the full
pixel_shift chain (curvature, subject histogram, pop shaping, layer weights,
zero-parallax lock with floating-window tracking, clamp, edge suppression,
grid_sample warp, feathering), color grading and sharpening. Our pipeline
runs in parity mode (exact quantiles + u8 truncation round-trips).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from visiondepth3d_tpu.state import init_trackers
from visiondepth3d_tpu.stereo import StereoParams
from visiondepth3d_tpu.stereo.step import stereo_frame_step

H, W = 96, 160


# --------------- independent torch implementation (the spec) ---------------


def t_subject_depth(d):
    _, HH, WW = d.shape
    crop = d[:, HH // 5 : HH * 4 // 5, WW // 5 : WW * 4 // 5]
    valid = crop[(crop > 0.05) & (crop < 0.95)]
    if valid.numel() < 20:
        return torch.tensor(0.5)
    hist = torch.histc(valid, 64, 0.0, 1.0)
    subject = (torch.argmax(hist).float() + 0.5) / 64
    return (0.7 * subject + 0.3 * torch.median(valid)).clamp(0, 1)


def t_shape_pop(d, subj, lo_q, hi_q, mid, gamma):
    d = d.clamp(0, 1)
    lo, hi = torch.quantile(d, lo_q), torch.quantile(d, hi_q)
    if (hi - lo) < 1e-5:
        ds, ss = d, subj.clamp(0, 1)
    else:
        ds = ((d - lo) / (hi - lo + 1e-6)).clamp(0, 1)
        ss = ((subj.clamp(0, 1) - lo) / (hi - lo + 1e-6)).clamp(0, 1)
    c = ds - ss + mid
    return (torch.sign(c - mid) * (c - mid).abs() ** gamma + mid).clamp(0, 1)


class TorchRefPipeline:
    """Stateful reference chain for one render (documented formulas only)."""

    def __init__(self, p: StereoParams):
        self.p = p
        self.prev_depth = None
        self.norm_lo = self.norm_hi = None
        self.sm = None
        self.fw_prev, self.fw_count = 0.0, 0
        self.conv_val = None
        self.bar_prev = 0
        self.focal = None
        self.prev_norm = None

    def frame(self, frame_np, depth_np):
        p = self.p
        f = torch.from_numpy(np.moveaxis(frame_np, -1, 0))  # [3,H,W] RGB
        d = torch.from_numpy(depth_np)[None]  # [1,H,W]

        # temporal EMA (alpha 0.5) + percentile EMA normalize (0.02/0.98, 0.92)
        if self.prev_depth is None:
            self.prev_depth = d.clone()
        self.prev_depth = 0.5 * self.prev_depth + 0.5 * d
        d = self.prev_depth
        dc = d.clamp(0, 1)
        lo, hi = torch.quantile(dc, 0.02), torch.quantile(dc, 0.98)
        if (hi - lo) >= 1e-5:
            if self.norm_lo is None:
                self.norm_lo, self.norm_hi = lo, hi
            else:
                self.norm_lo = 0.92 * self.norm_lo + 0.08 * lo
                self.norm_hi = 0.92 * self.norm_hi + 0.08 * hi
            d = ((dc - self.norm_lo) / (self.norm_hi - self.norm_lo + 1e-6)).clamp(0, 1)
        else:
            d = dc

        # shift smoothing (0.15) + dynamic parallax (0.90..1.15)
        vals = (float(p.fg_shift), float(p.mg_shift), float(p.bg_shift))
        if self.sm is None:
            self.sm = list(vals)
        else:
            self.sm = [0.15 * v + 0.85 * s for v, s in zip(vals, self.sm)]
        fg, mg, bg = self.sm
        _, HH, WW = d.shape
        crop = d[:, HH // 4 : HH * 3 // 4, WW // 4 : WW * 3 // 4]
        nv = (torch.var(crop) / (torch.mean(crop) + 1e-5)).clamp(0, 1)
        dyn = float(0.90 + nv * 0.25)
        fg, mg, bg = fg * dyn, mg * dyn, bg * dyn

        # ---- pixel_shift ----
        yy, xx = torch.meshgrid(
            torch.linspace(-1, 1, HH), torch.linspace(-1, 1, WW), indexing="ij"
        )
        dd = (d + (1 - (xx**2 + yy**2))[None] * float(p.curvature_strength)).clamp(0, 1)
        subj_raw = t_subject_depth(dd)
        shaped = t_shape_pop(dd, subj_raw, float(p.depth_stretch_lo),
                             float(p.depth_stretch_hi), float(p.depth_pop_mid),
                             float(p.depth_pop_gamma))
        subject = t_subject_depth(shaped)

        fg_w = (1 - shaped).pow(1.5).clamp(0, 1)
        mg_w = (1 - (shaped - float(p.depth_pop_mid)).abs() * 3).clamp(0, 1)
        bg_w = shaped.clamp(0, 1)
        half = WW / 2.0
        raw = (fg_w * fg * float(p.fg_pop_multiplier) + mg_w * mg
               + bg_w * bg * float(p.bg_push_multiplier))
        total = raw * float(p.parallax_balance) / half

        adj = subject * float(p.parallax_balance)
        zp = ((-adj * fg * float(p.fg_pop_multiplier)) + (-adj * mg)
              + (adj * bg * float(p.bg_push_multiplier))) / half
        zp = zp * float(p.subject_lock_strength) - float(p.zero_parallax_strength)
        sw = torch.clamp(1.0 - subject * 2.0, 0.5, 1.0)
        zp = torch.clamp(zp * sw, -0.35, 0.35)
        # floating window tracker (alpha 0.97, threshold 0.0015, clamp@100)
        cur = float(zp)
        if abs(cur - self.fw_prev) >= 0.0015:
            self.fw_prev = 0.97 * self.fw_prev + 0.03 * cur
            self.fw_count += 1
            if self.fw_count >= 100:
                self.fw_prev = max(min(self.fw_prev, 1.0), -1.0)
                self.fw_count = 0
        total = total - self.fw_prev

        mx = WW * float(p.max_pixel_shift_percent) / half
        total = torch.clamp(total, -mx, mx)
        conv = subject * float(p.convergence_strength)
        total = total - float(conv) / half

        ms = float(np.clip(float(p.feather_strength) / 10.0, 0.05, 0.3))
        dx = torch.abs(F.pad(shaped[:, :, 1:] - shaped[:, :, :-1], (1, 0)))
        dy = torch.abs(F.pad(shaped[:, 1:, :] - shaped[:, :-1, :], (0, 0, 1, 0)))
        gm = torch.sqrt(dx**2 + dy**2)
        em = torch.sigmoid((gm - 0.02) * float(p.feather_strength) * 5)
        smooth = F.avg_pool2d((1 - em).unsqueeze(0), 5, 1, 2).squeeze(0)
        final = (1 - ms) * total + ms * (total * smooth)
        sv = final.squeeze(0)

        xxg, yyg = torch.meshgrid(torch.linspace(-1, 1, WW),
                                  torch.linspace(-1, 1, HH), indexing="xy")
        base = torch.stack((xxg, yyg), -1)
        gl, gr = base.clone(), base.clone()
        gl[..., 0] += sv
        gr[..., 0] -= sv

        def gs(img, g):
            return F.grid_sample(img[None], g[None], mode="bilinear",
                                 padding_mode="border", align_corners=True)[0]

        wl, wr = gs(f, gl), gs(f, gr)
        dl, dr = gs(shaped, gl), gs(shaped, gr)

        def feather(shifted, depth_t):
            gx = F.pad(depth_t[:, :, 1:] - depth_t[:, :, :-1], (1, 0))
            gy = F.pad(depth_t[:, 1:, :] - depth_t[:, :-1, :], (0, 0, 1, 0))
            m = torch.clamp(torch.sqrt(gx**2 + gy**2) * float(p.feather_strength), 0, 1)
            blur = F.avg_pool2d(m.unsqueeze(0), p.blur_ksize, 1,
                                p.blur_ksize // 2).squeeze(0).repeat(3, 1, 1)
            return (shifted * (1 - blur) + f * blur).clamp(0, 1)

        left, right = feather(wl, dl), feather(wr, dr)

        def q8(x):
            return torch.floor(x.clamp(0, 1) * 255.0) / 255.0

        left, right = q8(left), q8(right)

        # focal tracking runs (state) though DOF is off in this test
        cand = float(t_subject_depth(d))
        mad = 0.0 if self.prev_norm is None else float(
            torch.mean(torch.abs(d - self.prev_norm))
        )
        motion = max(0.0, min(1.0, mad * 4.0))
        alpha = 0.10 + 0.20 * motion
        if self.focal is None:
            self.focal = cand
        else:
            c = self.focal if abs(cand - self.focal) < 0.03 else cand
            nf = (1 - alpha) * self.focal + alpha * c
            delta = max(-0.02, min(0.02, nf - self.focal))
            self.focal = max(0.0, min(1.0, self.focal + delta))

        # color grade
        def grade(x):
            r, g, b = x[0], x[1], x[2]
            luma = 0.2126 * r + 0.7152 * g + 0.0722 * b
            sat = torch.stack([luma + (c_ - luma) * float(p.color_saturation)
                               for c_ in (r, g, b)])
            con = 0.5 + (sat - 0.5) * float(p.color_contrast)
            return (con + float(p.color_brightness)).clamp(0, 1)

        left, right = q8(grade(left)), q8(grade(right))

        # floating-window side masks (conv EMA 0.97 + bar easer 0.85)
        s3 = t_subject_depth(d)
        raw_zero = float((-s3 * fg - s3 * mg + s3 * bg) / (WW / 2 + 1e-6))
        self.conv_val = raw_zero if self.conv_val is None else (
            0.97 * self.conv_val + 0.03 * raw_zero
        )
        bar = 0
        side = 0
        if True:  # use_floating_window and use_subject_tracking
            raw_bar = int(abs(self.conv_val) * WW * 0.75)
            self.bar_prev = int(0.85 * self.bar_prev + 0.15 * raw_bar)
            bar = max(min(self.bar_prev, 80), 0)
            if self.conv_val > 0.005:
                side = 1
            elif self.conv_val < -0.005:
                side = -1
        if side == 1:
            left[:, :, WW - bar :] = 0
            right[:, :, WW - bar :] = 0
        elif side == -1:
            left[:, :, :bar] = 0
            right[:, :, :bar] = 0

        # sharpen (cv2 kernel, reflect-101)
        def sharpen(x):
            fct = float(p.sharpness_factor)
            k = torch.tensor([[0, -1, 0], [-1, 5 + fct, -1], [0, -1, 0]])
            k = (k / k.sum()).float()
            xp = F.pad(x[None], (1, 1, 1, 1), mode="reflect")
            out = F.conv2d(xp, k.view(1, 1, 3, 3).expand(3, 1, 3, 3), groups=3)[0]
            return out.clamp(0, 1)

        left, right = q8(sharpen(left)), q8(sharpen(right))
        self.prev_norm = d.clone()
        return (np.moveaxis(left.numpy(), 0, -1),
                np.moveaxis(right.numpy(), 0, -1))


def ssim(a: np.ndarray, b: np.ndarray, win: int = 7) -> float:
    """Simple windowed SSIM on the luma plane."""
    def luma(x):
        return 0.2126 * x[..., 0] + 0.7152 * x[..., 1] + 0.0722 * x[..., 2]

    x, y = luma(a).astype(np.float64), luma(b).astype(np.float64)
    from numpy.lib.stride_tricks import sliding_window_view

    xw = sliding_window_view(x, (win, win))
    yw = sliding_window_view(y, (win, win))
    mx = xw.mean(axis=(-1, -2))
    my = yw.mean(axis=(-1, -2))
    vx = xw.var(axis=(-1, -2))
    vy = yw.var(axis=(-1, -2))
    cov = (xw * yw).mean(axis=(-1, -2)) - mx * my
    c1, c2 = 0.01**2, 0.03**2
    s = ((2 * mx * my + c1) * (2 * cov + c2)) / (
        (mx**2 + my**2 + c1) * (vx + vy + c2)
    )
    return float(s.mean())


@pytest.mark.parametrize("seed", [0])
def test_full_chain_ssim_vs_reference_formulas(seed):
    rng = np.random.default_rng(seed)
    t = 6
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
        # quantize like a decoded depth video (k/255)
        d = np.round(d * 255.0) / 255.0
        frames.append(np.clip(f, 0, 1))
        depths.append(d.astype(np.float32))

    p = StereoParams(parity_quantize=True, quantile_mode="exact",
                     blur_ksize=7, warp_backend="gather")
    ref = TorchRefPipeline(p)
    trackers = init_trackers(H, W)

    worst = 1.0
    for i in range(t):
        ref_l, ref_r = ref.frame(frames[i], depths[i])
        trackers, out = stereo_frame_step(
            p, trackers, jnp.asarray(frames[i]), jnp.asarray(depths[i])
        )
        sl = ssim(np.asarray(out.left), ref_l)
        sr = ssim(np.asarray(out.right), ref_r)
        worst = min(worst, sl, sr)
    assert worst >= 0.99, f"SSIM vs reference formulas: {worst:.4f}"
