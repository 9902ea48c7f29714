"""Resampling and stencil filters vs torch ground truth."""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from visiondepth3d_tpu.ops import filters, resize


def _torch_bilinear(img_hwc, size, align_corners=False):
    t = torch.from_numpy(np.moveaxis(img_hwc, -1, 0))[None]
    out = F.interpolate(t, size=size, mode="bilinear", align_corners=align_corners)
    return np.moveaxis(out[0].numpy(), 0, -1)


def test_bilinear_resize_matches_torch(rgb_frame):
    for size in [(48, 80), (192, 320), (100, 131)]:
        for ac in (False, True):
            ours = np.asarray(resize.resize_bilinear(jnp.asarray(rgb_frame), size, ac))
            ref = _torch_bilinear(rgb_frame, size, ac)
            np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=0)


def test_bilinear_resize_2d(depth_ramp):
    ours = np.asarray(resize.resize_bilinear(jnp.asarray(depth_ramp), (48, 80)))
    ref = _torch_bilinear(depth_ramp[..., None], (48, 80))[..., 0]
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=0)


def test_area_resize_integer_factor_is_box_average(rgb_frame):
    # integer 2x downscale must equal 2x2 mean pooling (cv2.INTER_AREA)
    ours = np.asarray(resize.resize_area(jnp.asarray(rgb_frame), (48, 80)))
    ref = rgb_frame.reshape(48, 2, 80, 2, 3).mean(axis=(1, 3))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=0)


def test_area_resize_preserves_mean(rgb_frame):
    # non-integer shrink: box integration preserves the global mean
    ours = np.asarray(resize.resize_area(jnp.asarray(rgb_frame), (37, 61)))
    assert abs(float(ours.mean()) - float(rgb_frame.mean())) < 1e-3


def test_box_blur_matches_avg_pool(depth_ramp):
    for k in (3, 5, 7, 9):
        ours = np.asarray(filters.box_blur(jnp.asarray(depth_ramp), k))
        t = torch.from_numpy(depth_ramp)[None, None]
        ref = F.avg_pool2d(t, kernel_size=k, stride=1, padding=k // 2)[0, 0].numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6, rtol=0)


def test_gaussian_blur_matches_torch_conv(rgb_frame):
    # independent torch reference: separable conv with reflect padding
    sigma, ksize = 1.5, 7
    lim = (ksize - 1) / 2.0
    xs = torch.linspace(-lim, lim, ksize)
    k1 = torch.exp(-0.5 * (xs / sigma) ** 2)
    k1 = (k1 / k1.sum()).float()
    t = torch.from_numpy(np.moveaxis(rgb_frame, -1, 0))[None]
    pad = ksize // 2
    tp = F.pad(t, (0, 0, pad, pad), mode="reflect")
    tv = F.conv2d(tp, k1.view(1, 1, ksize, 1).expand(3, 1, ksize, 1), groups=3)
    tp = F.pad(tv, (pad, pad, 0, 0), mode="reflect")
    ref = F.conv2d(tp, k1.view(1, 1, 1, ksize).expand(3, 1, 1, ksize), groups=3)
    ref = np.moveaxis(ref[0].numpy(), 0, -1)
    ours = np.asarray(filters.gaussian_blur(jnp.asarray(rgb_frame), ksize, sigma))
    np.testing.assert_allclose(ours, ref, atol=1e-6, rtol=0)


def test_forward_diff_grad_matches_torch_pad(depth_ramp):
    d = torch.from_numpy(depth_ramp)[None]
    dx_ref = F.pad(d[:, :, 1:] - d[:, :, :-1], (1, 0))[0].numpy()
    dy_ref = F.pad(d[:, 1:, :] - d[:, :-1, :], (0, 0, 1, 0))[0].numpy()
    dx, dy = filters.forward_diff_grad(jnp.asarray(depth_ramp))
    np.testing.assert_allclose(np.asarray(dx), dx_ref, atol=1e-7)
    np.testing.assert_allclose(np.asarray(dy), dy_ref, atol=1e-7)


def test_sharpen_reference_formula(rgb_frame):
    # independent formula: ((5+f)*x - 4-neighborhood sum) / (1+f), reflect-101
    f = 0.7
    x = torch.from_numpy(np.moveaxis(rgb_frame, -1, 0))[None]
    k = torch.tensor([[0, -1, 0], [-1, 5 + f, -1], [0, -1, 0]], dtype=torch.float32)
    k = k / k.sum()
    xp = F.pad(x, (1, 1, 1, 1), mode="reflect")
    ref = F.conv2d(xp, k.view(1, 1, 3, 3).expand(3, 1, 3, 3), groups=3)
    ref = np.clip(np.moveaxis(ref[0].numpy(), 0, -1), 0, 1)
    ours = np.asarray(filters.sharpen(jnp.asarray(rgb_frame), f))
    np.testing.assert_allclose(ours, ref, atol=1e-6, rtol=0)


def test_bilinear_big_size_path_matches_torch(rng):
    # sizes above the matrix limit take the device-built matrix path; its
    # exact integer src construction can differ from torch's f32 coordinate
    # rounding by one weight ulp at large indices (~3.5e-5) — far below the
    # u8 step (3.9e-3) the pipeline quantizes to
    img = rng.random((64, 518, 3), dtype=np.float32)
    for ac in (False, True):
        ours = np.asarray(
            resize.resize_bilinear(jnp.asarray(img), (64, 1920), ac)
        )
        ref = _torch_bilinear(img, (64, 1920), ac)
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=0)


def test_area_gather_integer_pooling(rng):
    img = rng.random((16, 1920, 3), dtype=np.float32)
    ours = np.asarray(resize.resize_area(jnp.asarray(img), (8, 960)))
    ref = img.reshape(8, 2, 960, 2, 3).mean(axis=(1, 3))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=0)
