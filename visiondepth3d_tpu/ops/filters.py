"""Small stencil filters: box blur, Gaussian blur, sharpening, gradients.

These mirror the reference's per-frame filter zoo:
- ``F.avg_pool2d(k, stride=1, padding=k//2)`` with zero padding counted in
  the average (render_3d.py:213, 355-360, 444, 456),
- torchvision ``gaussian_blur`` for DOF pyramid levels (render_3d.py:806),
- ``cv2.filter2D`` 3x3 sharpen with BORDER_REFLECT_101 (render_3d.py:717-732),
- the left/top-padded forward-difference gradients used by every edge mask
  (render_3d.py:204-206, 347-349, 438-440).

All operate on [..., H, W] or [H, W, C] float arrays and are elementwise/
stencil work XLA fuses into surrounding graphs; the Pallas fused stereo
kernel re-implements the hot subset in-VMEM.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def box_blur(x: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Mean filter over a k x k window, stride 1, zero padding counted in the
    mean — exact F.avg_pool2d(count_include_pad=True) parity.

    x: [..., H, W] (blur over the last two axes).
    """
    if ksize <= 1:
        return x
    pad = ksize // 2
    strides = [1] * x.ndim
    # separable: two 1-D window sums (k+k reads/px instead of k*k); the
    # zero padding makes row/column sums exactly commute with avg_pool2d
    pad_h = [(0, 0)] * (x.ndim - 2) + [(pad, ksize - 1 - pad), (0, 0)]
    pad_w = [(0, 0)] * (x.ndim - 2) + [(0, 0), (pad, ksize - 1 - pad)]
    win_h = [1] * (x.ndim - 2) + [ksize, 1]
    win_w = [1] * (x.ndim - 2) + [1, ksize]
    zero = jnp.zeros((), x.dtype)
    summed = lax.reduce_window(x, zero, lax.add, win_h, strides, pad_h)
    summed = lax.reduce_window(summed, zero, lax.add, win_w, strides, pad_w)
    return summed / jnp.asarray(float(ksize * ksize), x.dtype)


@functools.lru_cache(maxsize=64)
def _gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    """torchvision _get_gaussian_kernel1d parity: exp(-(x/sigma)^2/2), normalized."""
    lim = (ksize - 1) / 2.0
    x = np.linspace(-lim, lim, ksize)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(x: jnp.ndarray, ksize: int, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur with reflect padding (torchvision parity).

    x: [H, W] or [H, W, C].
    """
    if sigma <= 0.0 or ksize <= 1:
        return x
    k = jnp.asarray(_gaussian_kernel_1d(ksize, sigma), dtype=x.dtype)
    pad = ksize // 2
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]
    xp = jnp.pad(x, [(pad, pad), (0, 0), (0, 0)], mode="reflect")
    x = _sep_conv(xp, k, axis=0)
    xp = jnp.pad(x, [(0, 0), (pad, pad), (0, 0)], mode="reflect")
    x = _sep_conv(xp, k, axis=1)
    if squeeze:
        x = x[..., 0]
    return x


def _sep_conv(xp: jnp.ndarray, k: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Correlate padded [H, W, C] along axis with 1-D kernel k (valid mode)."""
    ksize = k.shape[0]
    # Unrolled shifted adds: ksize is small (<= ~13 for DOF sigmas) and XLA
    # fuses the adds; avoids conv layout overhead for 3-channel images.
    out = None
    size = xp.shape[axis] - ksize + 1
    for i in range(ksize):
        sl = lax.slice_in_dim(xp, i, i + size, axis=axis)
        term = sl * k[i]
        out = term if out is None else out + term
    return out


def sharpen(x: jnp.ndarray, factor) -> jnp.ndarray:
    """Brightness-preserving 3x3 sharpen (cv2 kernel from render_3d.py:717-729:
    [[0,-1,0],[-1,5+f,-1],[0,-1,0]] normalized to its sum 1+f), reflect-101
    border (cv2.filter2D default), clamped to [0, 1].

    x: [H, W, C] float; ``factor`` may be a traced scalar.
    """
    factor = jnp.asarray(factor, dtype=x.dtype)
    ksum = 1.0 + factor
    # guard the reference's "if kernel_sum != 0" branch
    safe = jnp.where(ksum == 0.0, 1.0, ksum)
    w_center = jnp.where(ksum == 0.0, 5.0 + factor, (5.0 + factor) / safe)
    w_cross = jnp.where(ksum == 0.0, -1.0, -1.0 / safe)
    xp = jnp.pad(x, [(1, 1), (1, 1), (0, 0)], mode="reflect")
    h, w, c = x.shape
    up = lax.slice(xp, (0, 1, 0), (h, 1 + w, c))
    down = lax.slice(xp, (2, 1, 0), (2 + h, 1 + w, c))
    left = lax.slice(xp, (1, 0, 0), (1 + h, w, c))
    right = lax.slice(xp, (1, 2, 0), (1 + h, 2 + w, c))
    out = w_center * x + w_cross * (up + down + left + right)
    return jnp.clip(out, 0.0, 1.0)


def bilateral_smooth_depth(
    d: jnp.ndarray,
    ksize: int = 9,
    sigma_color: float = 75.0,
    sigma_space: float = 75.0,
) -> jnp.ndarray:
    """Edge-preserving bilateral smoothing of a depth map.

    Spec: the reference's ``bilateral_smooth_depth`` (render_3d.py:191-195),
    i.e. ``cv2.bilateralFilter(u8, d=9, sigmaColor=75, sigmaSpace=75)`` on a
    uint8 depth plane — dead code in the reference render path, provided for
    strict §2.1 completeness. OpenCV semantics transcribed: circular window
    of radius ``ksize // 2`` (taps with euclidean distance > radius are
    skipped), spatial weight ``exp(-0.5 r^2 / sigma_space^2)``, range weight
    ``exp(-0.5 dv^2 / sigma_color^2)`` with ``dv`` in u8 value scale,
    reflect-101 borders.

    d: [H, W] float depth in [0, 1] (internally treated in u8 scale like
    the reference, but WITHOUT the destructive u8 round-trip). Static taps
    unroll into shifted adds — XLA fuses them; no gathers.
    """
    radius = ksize // 2
    sc = max(float(sigma_color), 1.0)
    ss = max(float(sigma_space), 1.0)
    v = d * 255.0
    vp = jnp.pad(v, radius, mode="reflect")
    h, w = v.shape
    num = jnp.zeros_like(v)
    den = jnp.zeros_like(v)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            r2 = dy * dy + dx * dx
            if r2 > radius * radius:
                continue  # cv2's circular mask
            sw = np.exp(-0.5 * r2 / (ss * ss))
            tap = lax.slice(
                vp, (radius + dy, radius + dx), (radius + dy + h, radius + dx + w)
            )
            diff = tap - v
            wgt = sw * jnp.exp(-0.5 * (diff * diff) / (sc * sc))
            num = num + wgt * tap
            den = den + wgt
    return (num / den) / 255.0


def forward_diff_grad(d: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Left/top zero-padded forward differences (torch F.pad parity).

    d: [H, W]. Returns (dx, dy) each [H, W]:
    dx[:, 0] = 0, dx[:, x] = d[:, x] - d[:, x-1]; same for dy along rows.
    """
    dx = jnp.pad(d[:, 1:] - d[:, :-1], [(0, 0), (1, 0)])
    dy = jnp.pad(d[1:, :] - d[:-1, :], [(1, 0), (0, 0)])
    return dx, dy


def grad_magnitude(d: jnp.ndarray) -> jnp.ndarray:
    """sqrt(dx^2 + dy^2) of forward differences — the edge detector used by
    suppress_artifacts_with_edge_mask / feather / heal."""
    dx, dy = forward_diff_grad(d)
    return jnp.sqrt(dx * dx + dy * dy)
