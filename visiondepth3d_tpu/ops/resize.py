"""Image resampling as separable matrix products (MXU-native resize).

The reference resizes with ``F.interpolate(mode='bilinear',
align_corners=False)`` (render_3d.py:595-596, 1262-1263) and
``cv2.resize(INTER_AREA / INTER_LINEAR)`` (render_3d.py:121, 847-848, 1413).
Those are gather-based samplers on GPU. On TPU, a fixed-size resample is a
pair of *static* linear operators: ``out = R_h @ img @ R_w^T``. Building the
(out_size, in_size) weight matrices at trace time turns resizing into two
dense matmuls that run on the MXU and fuse with neighboring ops — no dynamic
gathers, no scalar loops.

Conventions implemented (verified against torch / cv2 semantics in tests):

- ``bilinear`` with ``align_corners=False``: src = (dst + 0.5) * s - 0.5,
  coordinates clamped to the valid range (torch behavior).
- ``bilinear`` with ``align_corners=True``: src = dst * (in-1)/(out-1).
- ``area``: true box integration of the source interval
  [dst*s, (dst+1)*s) — cv2.INTER_AREA for downscaling. For upscaling,
  cv2 falls back to bilinear, and so do we.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=256)
def _linear_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) bilinear interpolation weights."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    if out_size == 1 and align_corners:
        m[0, 0] = 1.0
        return m
    dst = np.arange(out_size, dtype=np.float64)
    if align_corners:
        src = dst * (in_size - 1) / max(out_size - 1, 1)
    else:
        scale = in_size / out_size
        src = (dst + 0.5) * scale - 0.5
        src = np.clip(src, 0.0, in_size - 1)
    x0 = np.floor(src).astype(np.int64)
    x0 = np.clip(x0, 0, in_size - 1)
    x1 = np.clip(x0 + 1, 0, in_size - 1)
    w = (src - x0).astype(np.float64)
    m[dst.astype(np.int64), x0] += (1.0 - w).astype(np.float32)
    # use np.add.at for the second tap: x1 may equal x0 at the border
    np.add.at(m, (dst.astype(np.int64), x1), w.astype(np.float32))
    return m


@functools.lru_cache(maxsize=256)
def _area_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) box-integration weights (cv2.INTER_AREA shrink)."""
    if out_size >= in_size:
        return _linear_matrix(in_size, out_size, align_corners=False)
    m = np.zeros((out_size, in_size), dtype=np.float64)
    scale = in_size / out_size
    for o in range(out_size):
        a, b = o * scale, (o + 1) * scale
        i0, i1 = int(np.floor(a)), int(np.ceil(b))
        for i in range(i0, min(i1, in_size)):
            overlap = min(b, i + 1) - max(a, i)
            if overlap > 0:
                m[o, i] = overlap
    m /= scale
    return m.astype(np.float32)


def _is_channel_last(img: jnp.ndarray, channel_last: bool | None) -> bool:
    if channel_last is not None:
        return channel_last
    # auto: a trailing axis of <= 4 is a color channel ([H, W, 3] frames,
    # [H, W, 1] masks); anything else is spatial-last ([H, W], [T, H, W])
    return img.ndim >= 3 and img.shape[-1] <= 4


def _cubic_weight(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel. torch bicubic uses a=-0.75 (not Keys' -0.5)."""
    ax = np.abs(x)
    w = np.where(
        ax <= 1,
        (a + 2) * ax**3 - (a + 3) * ax**2 + 1,
        np.where(ax < 2, a * ax**3 - 5 * a * ax**2 + 8 * a * ax - 4 * a, 0.0),
    )
    return w


@functools.lru_cache(maxsize=64)
def _cubic_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out, in) bicubic weights, torch F.interpolate(mode='bicubic') parity
    (a=-0.75, edge-replicated taps)."""
    m = np.zeros((out_size, in_size), dtype=np.float64)
    dst = np.arange(out_size, dtype=np.float64)
    if align_corners:
        src = dst * (in_size - 1) / max(out_size - 1, 1)
    else:
        src = (dst + 0.5) * (in_size / out_size) - 0.5
    x0 = np.floor(src).astype(np.int64)
    t = src - x0
    for tap in (-1, 0, 1, 2):
        w = _cubic_weight(tap - t)
        idx = np.clip(x0 + tap, 0, in_size - 1)
        np.add.at(m, (dst.astype(np.int64), idx), w)
    return m.astype(np.float32)


def resize_bicubic(
    img: jnp.ndarray,
    out_hw: tuple[int, int],
    align_corners: bool = False,
    channel_last: bool | None = None,
) -> jnp.ndarray:
    """Bicubic resize with torch semantics (used for ViT position-embedding
    re-gridding, Dinov2Embeddings.interpolate_pos_encoding parity)."""
    hwc = _is_channel_last(img, channel_last)
    h, w = _spatial_shape(img, hwc)
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return img
    return _apply_separable(
        img, _cubic_matrix(h, oh, align_corners), _cubic_matrix(w, ow, align_corners),
        hwc,
    )


def _apply_separable(
    img: jnp.ndarray, rh: np.ndarray, rw: np.ndarray, hwc: bool,
    precision=None,
) -> jnp.ndarray:
    """Apply row/col resampling matrices to [..., H, W, C] (hwc) or
    [..., H, W].

    Resampling weights are exact f32; by default force full-precision
    dots so the resize is bit-stable (the MXU would otherwise run bf16
    passes). Callers resizing u8-source video in bf16 pass
    ``precision="default"`` — single-pass MXU, half the HBM traffic.
    """
    import jax

    hp = precision or jax.lax.Precision.HIGHEST
    if hp == "default":
        hp = jax.lax.Precision.DEFAULT
    rh = jnp.asarray(rh, dtype=img.dtype)
    rw = jnp.asarray(rw, dtype=img.dtype)
    if hwc:
        out = jnp.einsum("oh,...hwc->...owc", rh, img, precision=hp)
        return jnp.einsum("pw,...owc->...opc", rw, out, precision=hp)
    out = jnp.einsum("oh,...hw->...ow", rh, img, precision=hp)
    return jnp.einsum("pw,...ow->...op", rw, out, precision=hp)


def _spatial_shape(img: jnp.ndarray, hwc: bool) -> tuple[int, int]:
    return (img.shape[-3], img.shape[-2]) if hwc else (img.shape[-2], img.shape[-1])


# Above this many weight-matrix elements, resizes switch from the static
# matrix formulation (MXU matmul; embeds an (out, in) constant in the graph)
# to a runtime 2-tap gather. Multi-MB HLO constants make the TPU compiler
# pathologically slow, and at 2 taps/output the matrix is 99% zeros anyway.
_MATRIX_LIMIT = 1 << 18


def _device_linear_matrix(in_size: int, out_size: int, align_corners: bool,
                          dtype) -> jnp.ndarray:
    """(out, in) bilinear weights built ON DEVICE from two iotas.

    Identical to ``_linear_matrix`` (the 2-tap row is exactly the hat
    function ``relu(1 - |src_d - i|)`` once src is clamped to [0, in-1],
    including the collapsed-tap border case), but costs a tiny elementwise
    kernel instead of a multi-MB HLO constant — so big sizes keep the MXU
    matmul formulation instead of falling back to lane-axis gathers
    (measured: the 1080p->518 gather path costs ~0.3 ms/frame of the depth
    stage; the matmul path is ~50 us at bf16 peak).
    """
    # exact integer construction: src = num/den with num, den int32, so the
    # floor index is exact and the fractional weight w = (num mod den)/den
    # carries only one f32 rounding (a single f32 src value would round at
    # ulp(src) ~ 3e-5 for 1080p sizes; this stays at ~1e-7 vs the host
    # matrix's f64 construction)
    d = jnp.arange(out_size, dtype=jnp.int32)[:, None]
    i = jnp.arange(in_size, dtype=jnp.int32)[None, :]
    if align_corners:
        num = d * (in_size - 1)
        den = max(out_size - 1, 1)
    else:
        num = (2 * d + 1) * in_size - out_size
        den = 2 * out_size
    num = jnp.clip(num, 0, (in_size - 1) * den)
    q = num // den
    w = ((num - q * den).astype(jnp.float32) / den)
    m = (i == q) * (1.0 - w) + (i == q + 1) * w
    return m.astype(dtype)


def _gather_axis_linear(img: jnp.ndarray, out_size: int, axis: int,
                        align_corners: bool) -> jnp.ndarray:
    """Bilinear resample along one axis with runtime indices (torch parity)."""
    in_size = img.shape[axis]
    if in_size == 1:
        reps = [1] * img.ndim
        reps[axis] = out_size
        return jnp.tile(img, reps)
    dst = jnp.arange(out_size, dtype=jnp.float32)
    if align_corners:
        src = dst * ((in_size - 1) / max(out_size - 1, 1))
    else:
        src = jnp.clip((dst + 0.5) * (in_size / out_size) - 0.5, 0.0, in_size - 1)
    x0 = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, in_size - 1)
    x1 = jnp.clip(x0 + 1, 0, in_size - 1)
    w = (src - x0.astype(jnp.float32)).astype(img.dtype)
    shape = [1] * img.ndim
    shape[axis] = out_size
    w = w.reshape(shape)
    g0 = jnp.take(img, x0, axis=axis)
    g1 = jnp.take(img, x1, axis=axis)
    return g0 * (1.0 - w) + g1 * w


def resize_bilinear(
    img: jnp.ndarray,
    out_hw: tuple[int, int],
    align_corners: bool = False,
    channel_last: bool | None = None,
    precision=None,
) -> jnp.ndarray:
    """Bilinear resize to out_hw (torch F.interpolate parity).

    ``channel_last`` — True for [..., H, W, C], False for [..., H, W];
    None auto-detects by a trailing axis <= 4.
    """
    hwc = _is_channel_last(img, channel_last)
    h, w = _spatial_shape(img, hwc)
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return img
    if h * oh > _MATRIX_LIMIT or w * ow > _MATRIX_LIMIT:
        # big sizes: device-built weight matrices (no giant HLO constants,
        # still MXU matmuls). in_size == 1 needs the tile special case.
        if h > 1 and w > 1:
            return _apply_separable(
                img,
                _device_linear_matrix(h, oh, align_corners, img.dtype),
                _device_linear_matrix(w, ow, align_corners, img.dtype),
                hwc,
                precision=precision,
            )
        h_axis = img.ndim - 3 if hwc else img.ndim - 2
        out = _gather_axis_linear(img, oh, h_axis, align_corners)
        return _gather_axis_linear(out, ow, h_axis + 1, align_corners)
    return _apply_separable(
        img,
        _linear_matrix(h, oh, align_corners),
        _linear_matrix(w, ow, align_corners),
        hwc,
        precision=precision,
    )


def resize_area(
    img: jnp.ndarray, out_hw: tuple[int, int], channel_last: bool | None = None
) -> jnp.ndarray:
    """cv2.INTER_AREA-style resize (box average when shrinking)."""
    hwc = _is_channel_last(img, channel_last)
    h, w = _spatial_shape(img, hwc)
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return img
    if h * oh > _MATRIX_LIMIT or w * ow > _MATRIX_LIMIT:
        # large sizes: exact integer-factor box pooling (the common case —
        # Half-SBS packs at exactly 2:1), runtime-gather bilinear otherwise
        if h % oh == 0 and w % ow == 0:
            fh, fw = h // oh, w // ow
            h_axis = img.ndim - 3 if hwc else img.ndim - 2
            shape = (
                img.shape[:h_axis]
                + (oh, fh, ow, fw)
                + img.shape[h_axis + 2 :]
            )
            return img.reshape(shape).mean(axis=(h_axis + 1, h_axis + 3))
        h_axis = img.ndim - 3 if hwc else img.ndim - 2
        out = _gather_axis_linear(img, oh, h_axis, False)
        return _gather_axis_linear(out, ow, h_axis + 1, False)
    return _apply_separable(img, _area_matrix(h, oh), _area_matrix(w, ow), hwc)


def pad_to_aspect(
    img: jnp.ndarray, target_w: int, target_h: int
) -> jnp.ndarray:
    """Letterbox an [H, W, C] image into (target_h, target_w) with black bars.

    Mirrors ``pad_to_aspect_ratio`` (render_3d.py:101-131): aspect-preserving
    resize (INTER_AREA) to fit, then centered zero padding with integer
    offsets computed exactly like the reference's ``//`` arithmetic.
    """
    h, w = img.shape[0], img.shape[1]
    target_aspect = target_w / target_h
    current_aspect = w / h
    if current_aspect > target_aspect:
        new_w = target_w
        new_h = int(target_w / current_aspect)
    else:
        new_h = target_h
        new_w = int(current_aspect * target_h)
    resized = resize_area(img, (new_h, new_w))
    x_off = (target_w - new_w) // 2
    y_off = (target_h - new_h) // 2
    pad = [(y_off, target_h - new_h - y_off), (x_off, target_w - new_w - x_off)]
    if img.ndim == 3:
        pad.append((0, 0))
    return jnp.pad(resized, pad)
