"""Frame/depth conversions and quantization points.

The reference converts at fixed points (frame_to_tensor / depth_to_tensor /
tensor_to_frame, render_3d.py:135-143, 289-291): uint8 BGR -> float RGB/255
on the way in, float -> ``(x * 255).astype(uint8)`` (truncation!) on the way
out. Those truncations are part of the numerical contract the SSIM target
bakes in, so ``quantize_u8`` reproduces them exactly; the fast path skips
them and stays in float end-to-end.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# cv2 BGR2GRAY coefficients (same as Rec.601 luma on RGB)
_GRAY_RGB = (0.299, 0.587, 0.114)


def u8_to_float(img_u8) -> jnp.ndarray:
    """uint8 [..., C] -> float32 in [0, 1]."""
    return jnp.asarray(img_u8, dtype=jnp.float32) / 255.0


def float_to_u8_trunc(img: jnp.ndarray) -> jnp.ndarray:
    """tensor_to_frame parity: (x * 255) truncated toward zero to uint8."""
    return (jnp.clip(img, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def float_to_u8_round(img: jnp.ndarray) -> jnp.ndarray:
    """Round-to-nearest u8 (the better default for final encode)."""
    return jnp.clip(jnp.round(img * 255.0), 0.0, 255.0).astype(jnp.uint8)


def quantize_u8(img: jnp.ndarray) -> jnp.ndarray:
    """Apply the reference's u8 truncation round-trip while staying in float.

    quantize_u8(x) == float(u8(trunc(x*255))) / 255 — used by parity mode to
    reproduce the reference's host round-trips without leaving the device.
    """
    return jnp.floor(jnp.clip(img, 0.0, 1.0) * 255.0) / 255.0


def rgb_to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] RGB -> [...] gray with cv2/Rec.601 weights (float path).

    cv2's u8 conversion uses fixed-point round-to-nearest; callers that need
    exact u8 parity should quantize with round, not trunc.
    """
    return (
        _GRAY_RGB[0] * rgb[..., 0]
        + _GRAY_RGB[1] * rgb[..., 1]
        + _GRAY_RGB[2] * rgb[..., 2]
    )


def depth_frame_to_01(depth_rgb_u8) -> jnp.ndarray:
    """depth_to_tensor parity (render_3d.py:140-143): BGR depth frame ->
    gray/255. Input here is RGB uint8 (we decode to RGB); gray weights are
    symmetric to the reference's BGR2GRAY on a grayscale-ish source."""
    gray = rgb_to_gray(jnp.asarray(depth_rgb_u8, dtype=jnp.float32))
    return jnp.round(gray) / 255.0


def bgr_to_rgb(img: jnp.ndarray) -> jnp.ndarray:
    return img[..., ::-1]


def yuv420_to_rgb_u8(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """YUV420 uint8 planes -> RGB uint8 [..., H, W, 3], bit-exact with the
    C++ reader's yuv420_to_rgb (native/vd3d_media.cpp:40-57, BT.601
    limited range, nearest chroma upsample).

    The input analog of rgb_u8_to_yuv420: raw planes stream host->device
    (1.5 bytes/px, half of RGB) and the colorspace math runs on the VPU —
    the host decode leg becomes a pure fread (Y4MPlaneReader).
    """
    yi = jnp.asarray(y).astype(jnp.int32)
    # nearest upsample: chroma sample (j//2, i//2) covers a 2x2 luma block
    ui = jnp.repeat(jnp.repeat(jnp.asarray(u).astype(jnp.int32), 2,
                               axis=-1), 2, axis=-2)
    vi = jnp.repeat(jnp.repeat(jnp.asarray(v).astype(jnp.int32), 2,
                               axis=-1), 2, axis=-2)
    ui = ui[..., : yi.shape[-2], : yi.shape[-1]]
    vi = vi[..., : yi.shape[-2], : yi.shape[-1]]
    c = (yi - 16) * 298
    d = ui - 128
    e = vi - 128
    r = jnp.right_shift(c + 409 * e + 128, 8)
    g = jnp.right_shift(c - 100 * d - 208 * e + 128, 8)
    b = jnp.right_shift(c + 516 * d + 128, 8)
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(rgb, 0, 255).astype(jnp.uint8)


def rgb_u8_to_yuv420(rgb_u8: jnp.ndarray):
    """RGB uint8 [..., H, W, 3] -> (Y [..., H, W], U, V [..., H/2, W/2])
    uint8, bit-exact with the C++ writer's rgb_to_yuv420
    (native/vd3d_media.cpp:59-95, BT.601 limited range, 2x2 chroma mean).

    Runs the colorspace conversion on DEVICE so the host write path is a
    pure plane fwrite (Y4MWriter.write_yuv420) — and the device->host
    transfer shrinks to 1.5 bytes/px. H and W must be even (all output
    geometries are).
    """
    x = jnp.asarray(rgb_u8).astype(jnp.int32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = jnp.right_shift(66 * r + 129 * g + 25 * b + 128 + (16 << 8), 8)
    y = jnp.clip(y, 0, 255).astype(jnp.uint8)
    # chroma from exact 2x2 integer means (C++ sums then /4, floor)
    h, w = x.shape[-3], x.shape[-2]
    lead = x.shape[:-3]

    def pool(c):
        c = c.reshape(lead + (h // 2, 2, w // 2, 2))
        return jnp.right_shift(c.sum(axis=(-1, -3)), 2)

    rm, gm, bm = pool(r), pool(g), pool(b)
    u = jnp.right_shift(-38 * rm - 74 * gm + 112 * bm + 128, 8) + 128
    v = jnp.right_shift(112 * rm - 94 * gm - 18 * bm + 128, 8) + 128
    return (y,
            jnp.clip(u, 0, 255).astype(jnp.uint8),
            jnp.clip(v, 0, 255).astype(jnp.uint8))
