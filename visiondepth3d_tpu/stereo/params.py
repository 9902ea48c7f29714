"""The canonical stereo parameter schema.

This is the union of ``render_sbs_3d``'s signature (render_3d.py:933-984),
``pixel_shift_cuda``'s pop controls (render_3d.py:561-590) and the GUI
preset keys — the reference's full tuning surface, split into:

- traced fields (floats): change per render or even per frame without
  recompiling — they are pytree leaves fed into the jitted step;
- static fields (bools / kernel sizes / format strings): change the compiled
  graph and are hashable jit-static arguments.

Reference quirk intentionally FIXED here: the reference GUI plumbs pop
controls into ``render_sbs_3d`` but the render loop overwrites them with
hard-coded constants (render_3d.py:1299-1305), so the sliders only affect
the live preview. In this framework the pop controls are honored everywhere;
``pop_controls_locked_to_defaults()`` reproduces the reference's render-path
behavior for golden parity tests.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class StereoParams:
    # --- traced (pytree leaves; safe to change without recompile) ---
    fg_shift: jnp.ndarray = struct.field(default=8.0)
    mg_shift: jnp.ndarray = struct.field(default=-3.0)
    bg_shift: jnp.ndarray = struct.field(default=-6.0)
    sharpness_factor: jnp.ndarray = struct.field(default=1.0)
    feather_strength: jnp.ndarray = struct.field(default=10.0)
    max_pixel_shift_percent: jnp.ndarray = struct.field(default=0.02)
    parallax_balance: jnp.ndarray = struct.field(default=0.8)
    zero_parallax_strength: jnp.ndarray = struct.field(default=0.0)
    convergence_strength: jnp.ndarray = struct.field(default=0.0)
    ipd_factor: jnp.ndarray = struct.field(default=1.0)
    depth_pop_gamma: jnp.ndarray = struct.field(default=0.85)
    depth_pop_mid: jnp.ndarray = struct.field(default=0.50)
    depth_stretch_lo: jnp.ndarray = struct.field(default=0.05)
    depth_stretch_hi: jnp.ndarray = struct.field(default=0.95)
    fg_pop_multiplier: jnp.ndarray = struct.field(default=1.20)
    bg_push_multiplier: jnp.ndarray = struct.field(default=1.10)
    subject_lock_strength: jnp.ndarray = struct.field(default=1.00)
    color_saturation: jnp.ndarray = struct.field(default=1.0)
    color_contrast: jnp.ndarray = struct.field(default=1.0)
    color_brightness: jnp.ndarray = struct.field(default=0.0)
    heal_strength: jnp.ndarray = struct.field(default=0.5)
    curvature_strength: jnp.ndarray = struct.field(default=0.08)

    # --- static (graph structure; changing these recompiles) ---
    # pixel_shift-internal resize target (render_3d.py:595-596 gets
    # resized_w/h from the loop). None keeps the input resolution.
    warp_hw: tuple | None = struct.field(pytree_node=False, default=None)
    # static bound (pixels) on the disparity magnitude; enables the TPU
    # shifted-accumulation warp (ops/warp.py) instead of a slow gather.
    # Set via with_shift_bound() from the concrete max_pixel_shift_percent.
    max_shift_px_bound: int | None = struct.field(pytree_node=False, default=None)
    # warp implementation: "auto" (pallas on TPU when bounded, else XLA
    # shifted-acc, else gather), or force "pallas" / "xla" / "gather"
    warp_backend: str = struct.field(pytree_node=False, default="auto")
    # feather+heal implementation: "auto" (fused Pallas kernel on TPU when
    # the height divides the row blocks), or force "pallas" / "xla"
    postfx_backend: str = struct.field(pytree_node=False, default="auto")
    blur_ksize: int = struct.field(pytree_node=False, default=9)
    dof_strength: float = struct.field(pytree_node=False, default=0.0)
    use_subject_tracking: bool = struct.field(pytree_node=False, default=True)
    enable_floating_window: bool = struct.field(pytree_node=False, default=True)
    enable_edge_masking: bool = struct.field(pytree_node=False, default=True)
    enable_feathering: bool = struct.field(pytree_node=False, default=True)
    enable_dynamic_convergence: bool = struct.field(pytree_node=False, default=True)
    enable_healing: bool = struct.field(pytree_node=False, default=False)
    enable_curvature: bool = struct.field(pytree_node=False, default=True)
    enable_dynamic_parallax: bool = struct.field(pytree_node=False, default=True)
    quantile_mode: str = struct.field(pytree_node=False, default="hist")
    # dtype for the image-plane ops (warp taps, feather/heal blends, grade,
    # sharpen, DOF): "bfloat16" halves VPU/HBM traffic on the [H, W, 3]
    # tensors at a worst-case +-1 u8 step in the output; depth statistics,
    # EMA trackers and the positional warp math always stay float32.
    image_dtype: str = struct.field(pytree_node=False, default="float32")
    parity_quantize: bool = struct.field(pytree_node=False, default=False)
    dof_focus_width: float = struct.field(pytree_node=False, default=0.35)
    dof_levels: int = struct.field(pytree_node=False, default=5)

    def replace(self, **kwargs) -> "StereoParams":  # type: ignore[override]
        return dataclasses.replace(self, **kwargs)

    def with_shift_bound(self, width: int) -> "StereoParams":
        """Derive the static warp bound from the (concrete) shift clamp.

        Post-clamp disparity in grid units is <= 2 * max_pixel_shift_percent
        (render_3d.py:657-659) plus the small convergence bias subtracted
        after the clamp; in pixels that is pct * width plus a sub-pixel
        term. Call this while the params are concrete (pipeline build time).
        """
        import math

        pct = float(self.max_pixel_shift_percent)
        return self.replace(max_shift_px_bound=int(math.ceil(pct * width)) + 2)


def pop_controls_locked_to_defaults(p: StereoParams) -> StereoParams:
    """Reproduce the reference render path's hard-coded pop constants
    (render_3d.py:1299-1305) for golden parity testing."""
    return p.replace(
        depth_pop_gamma=0.85,
        depth_pop_mid=0.50,
        depth_stretch_lo=0.05,
        depth_stretch_hi=0.95,
        fg_pop_multiplier=1.20,
        bg_push_multiplier=1.10,
        subject_lock_strength=1.00,
    )
