"""3D output packing: SBS / VR / anaglyph / interlaced, plus side masks.

Behavioral spec: ``format_3d_output`` / ``generate_anaglyph_3d`` /
``apply_side_mask`` (render_3d.py:837-892).

All packers operate on channel-last float RGB in [0, 1] on device; the u8
conversion happens once at the encode boundary (unlike the reference, which
packs uint8 BGR on the host).

Anaglyph note: the reference splits its **BGR** frames but names the channels
r/g/b (render_3d.py:869-871), so it effectively applies the Dubois matrix in
BGR order — a red<->blue swap relative to the published Dubois transform. We
implement the correct RGB Dubois by default and expose
``bgr_convention=True`` to reproduce the reference's swapped output for
golden-frame parity.
"""

from __future__ import annotations

import jax.numpy as jnp

from .resize import pad_to_aspect, resize_bilinear

FORMATS = ("Half-SBS", "Full-SBS", "VR", "Red-Cyan Anaglyph", "Passive Interlaced")

# Dubois-style red-cyan matrix rows used by the reference (render_3d.py:873-875)
_DUBOIS_LEFT_RED = (0.4561, 0.5005, 0.1762)
_DUBOIS_RIGHT_GREEN = (0.3764, 0.7616, -0.1876)
_DUBOIS_RIGHT_BLUE = (-0.0401, -0.1126, 1.2723)


def anaglyph_red_cyan(
    left: jnp.ndarray, right: jnp.ndarray, bgr_convention: bool = False
) -> jnp.ndarray:
    """Dubois-style red-cyan anaglyph. left/right: [H, W, 3] RGB in [0, 1]."""
    if bgr_convention:
        left = left[..., ::-1]
        right = right[..., ::-1]
    lr, lg, lb = left[..., 0], left[..., 1], left[..., 2]
    rr, rg, rb = right[..., 0], right[..., 1], right[..., 2]
    red = _DUBOIS_LEFT_RED[0] * lr + _DUBOIS_LEFT_RED[1] * lg + _DUBOIS_LEFT_RED[2] * lb
    green = (
        _DUBOIS_RIGHT_GREEN[0] * rr
        + _DUBOIS_RIGHT_GREEN[1] * rg
        + _DUBOIS_RIGHT_GREEN[2] * rb
    )
    blue = (
        _DUBOIS_RIGHT_BLUE[0] * rr
        + _DUBOIS_RIGHT_BLUE[1] * rg
        + _DUBOIS_RIGHT_BLUE[2] * rb
    )
    out = jnp.stack(
        [jnp.clip(red, 0.0, 1.0), jnp.clip(green, 0.0, 1.0), jnp.clip(blue, 0.0, 1.0)],
        axis=-1,
    )
    if bgr_convention:
        out = out[..., ::-1]
    return out


def interlaced(left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
    """Passive interlaced: even rows from left, odd rows from right."""
    rows = jnp.arange(left.shape[0]) % 2
    sel = rows[:, None, None].astype(left.dtype)
    return left * (1.0 - sel) + right * sel


def apply_side_mask(img: jnp.ndarray, bar_width, side_sign) -> jnp.ndarray:
    """Black out ``bar_width`` columns on one edge (floating window bars).

    ``bar_width`` may be traced (the FloatingBarEaser animates it);
    ``side_sign`` is +1 for the right edge, -1 for the left edge, 0 disables.
    img: [H, W, C].
    """
    w = img.shape[1]
    # column indices in f32 regardless of image dtype (bf16 cannot resolve
    # column positions past 256)
    cols = jnp.arange(w, dtype=jnp.float32)[None, :, None]
    left_keep = cols >= bar_width
    right_keep = cols < (w - bar_width)
    keep = jnp.where(side_sign < 0, left_keep, jnp.where(side_sign > 0, right_keep, True))
    return img * keep.astype(img.dtype)


def format_3d_output(
    left: jnp.ndarray,
    right: jnp.ndarray,
    fmt: str,
    *,
    vr_eye_hw: tuple[int, int] = (1600, 1440),
    anaglyph_bgr_convention: bool = False,
) -> jnp.ndarray:
    """Pack per-eye frames into the final frame layout. fmt is static."""
    if fmt == "VR":
        lw = resize_bilinear(left, vr_eye_hw)
        rw = resize_bilinear(right, vr_eye_hw)
        return jnp.concatenate([lw, rw], axis=1)
    if fmt == "Red-Cyan Anaglyph":
        return anaglyph_red_cyan(left, right, anaglyph_bgr_convention)
    if fmt == "Passive Interlaced":
        return interlaced(left, right)
    # Half-SBS / Full-SBS / fallback: plain hstack (per-eye sizing upstream)
    return jnp.concatenate([left, right], axis=1)


def pack_per_eye(
    left: jnp.ndarray,
    right: jnp.ndarray,
    fmt: str,
    per_eye_w: int,
    per_eye_h: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-eye geometry before packing (render_3d.py:1409-1417): Half-SBS
    area-resizes each eye; everything else letterboxes with pad_to_aspect."""
    if fmt == "Half-SBS":
        from .resize import resize_area

        return (
            resize_area(left, (per_eye_h, per_eye_w)),
            resize_area(right, (per_eye_h, per_eye_w)),
        )
    return (
        pad_to_aspect(left, per_eye_w, per_eye_h),
        pad_to_aspect(right, per_eye_w, per_eye_h),
    )
