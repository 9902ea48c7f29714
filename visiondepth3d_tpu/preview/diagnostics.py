"""Single-frame diagnostic renders — the live-preview backend.

The reference's preview window re-renders one frame through the real engine
with 10 view modes (generate_preview_image, preview_utils.py:23-84; window
in preview_gui.py). Same capability here as a pure function: run the real
``stereo_frame_step`` on one frame and materialize any diagnostic view.
A GUI can debounce-call ``render_preview``; headless users save PNGs.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import anaglyph_red_cyan, grad_magnitude
from ..ops.convert import float_to_u8_round
from ..state import init_trackers
from ..stereo import StereoParams
from ..stereo.step import stereo_frame_step

PREVIEW_MODES = (
    "left",
    "right",
    "sbs",
    "anaglyph",
    "interlaced",
    "shift_heatmap",
    "lr_diff",
    "feather_mask",
    "depth",
    "overlay_arrows",
)


def _heatmap(x01: jnp.ndarray) -> jnp.ndarray:
    """Simple blue->red colormap for [H, W] data in [0, 1]."""
    r = jnp.clip(x01 * 2.0 - 1.0, 0.0, 1.0)
    b = jnp.clip(1.0 - x01 * 2.0, 0.0, 1.0)
    g = 1.0 - r - b
    return jnp.stack([r, jnp.clip(g, 0, 1), b], axis=-1)


def render_preview(
    frame01: np.ndarray,
    depth01: np.ndarray,
    params: StereoParams | None = None,
    mode: str = "sbs",
) -> np.ndarray:
    """frame01: [H, W, 3] float RGB; depth01: [H, W]. Returns uint8 RGB."""
    params = params or StereoParams()
    h, w = frame01.shape[:2]
    trackers = init_trackers(h, w)
    _, out = stereo_frame_step(
        params, trackers, jnp.asarray(frame01), jnp.asarray(depth01)
    )

    if mode == "left":
        img = out.left
    elif mode == "right":
        img = out.right
    elif mode == "sbs":
        img = jnp.concatenate([out.left, out.right], axis=1)
    elif mode == "anaglyph":
        img = anaglyph_red_cyan(out.left, out.right)
    elif mode == "interlaced":
        from ..ops import interlaced

        img = interlaced(out.left, out.right)
    elif mode == "shift_heatmap":
        s = out.shift_map
        lo, hi = jnp.min(s), jnp.max(s)
        img = _heatmap((s - lo) / jnp.maximum(hi - lo, 1e-9))
    elif mode == "lr_diff":
        d = jnp.mean(jnp.abs(out.left - out.right), axis=-1)
        img = _heatmap(jnp.clip(d * 4.0, 0.0, 1.0))
    elif mode == "feather_mask":
        gm = grad_magnitude(jnp.asarray(depth01))
        mask = jnp.clip(gm * params.feather_strength, 0.0, 1.0)
        img = jnp.stack([mask] * 3, axis=-1)
    elif mode == "depth":
        img = jnp.stack([jnp.asarray(depth01)] * 3, axis=-1)
    elif mode == "overlay_arrows":
        # arrow overlay approximation: brighten pixels by signed shift
        s = out.shift_map
        base = out.left
        pos = jnp.clip(s, 0, None) / jnp.maximum(jnp.max(jnp.abs(s)), 1e-9)
        neg = jnp.clip(-s, 0, None) / jnp.maximum(jnp.max(jnp.abs(s)), 1e-9)
        img = jnp.stack(
            [
                jnp.clip(base[..., 0] + pos, 0, 1),
                base[..., 1],
                jnp.clip(base[..., 2] + neg, 0, 1),
            ],
            axis=-1,
        )
    else:
        raise ValueError(f"unknown preview mode {mode!r}; one of {PREVIEW_MODES}")
    return np.asarray(float_to_u8_round(img))


def save_preview_set(frame01, depth01, out_dir, params=None, mode="sbs"):
    """Save the preview + input + depth PNG triplet
    (preview_gui.py:424-445 analog)."""
    from pathlib import Path

    from PIL import Image

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    prev = render_preview(frame01, depth01, params, mode)
    Image.fromarray(prev).save(out_dir / f"preview_{mode}.png")
    Image.fromarray((np.asarray(frame01) * 255).astype(np.uint8)).save(
        out_dir / "preview_input.png"
    )
    d8 = (np.asarray(depth01) * 255).astype(np.uint8)
    Image.fromarray(np.stack([d8] * 3, axis=-1)).save(out_dir / "preview_depth.png")
    return out_dir
