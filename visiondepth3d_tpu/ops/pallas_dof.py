"""Pallas TPU kernel: fused depth-of-field + color grade, both eyes.

ops/dof.py's LOD Gaussian stack is HBM-bound as XLA ops: each separable
blur pass re-streams the full frame per tap (k5 + k9 at two levels is
~28 frame-sized reads), measured 3.2 ms/frame of cfg3's 4K stereo stage
(benchmarks/stereo4k_split.py). This kernel holds a row block in VMEM,
computes every blur level, the per-pixel two-level lerp (dof.apply_dof
semantics), and the color grade (grade.apply_color_grade) in one pass:
one read of each eye + one write.

Reflect padding (torchvision parity, ops/filters.gaussian_blur) is done
ONCE in XLA on the [2, 3, H, W] eye planes — in-kernel reflection would
need row gathers; a single padded copy is one cheap pass. Row context
comes from two 8-row bottom granules (blur reach <= 8 rows, i.e.
max_sigma <= 3.5); the main block supplies the top context because its
padded-coordinate origin sits ``reach`` rows above the output rows.

Layout: channel-planar [eyes, 3, Hp, Wp] so W is the lane axis (a
channel-last [.., W, 3] block would use 3 of 128 lanes). Grid
(2 eyes, H/bh). Blend weights and grade scalars may be traced: the blur
index plane is computed outside (it carries the traced focal depth) and
the grade triple rides in as a tiny operand.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .filters import _gaussian_kernel_1d

_MAX_REACH = 8  # two 8-row context granules

# Measured on v5e at the cfg3 4K config: full stereo stage 14.96 ms/frame
# fused vs 14.76 with the XLA ops — a wash. The XLA LOD stack is HBM-bound
# (~3.2 ms of frame re-reads) but this kernel pays the same in VPU tap
# work (k5+k9 separable taps x 3ch x 2 eyes), so there is nothing to win
# until a tap formulation with fewer VPU ops exists. Kept as an opt-in
# (stereo/step.py consults this flag) and exact-parity tested.
USE_FUSED_DOF = False


def _dof_kernel(bh: int, wout: int, reach: int, taps, num_levels: int,
                main_ref, g1_ref, g2_ref, idx_ref, grade_ref, o_ref):
    rows = jnp.concatenate([main_ref[0], g1_ref[0], g2_ref[0]], axis=1)
    dt = rows.dtype
    p = reach

    def level(sig_taps):
        if sig_taps is None:  # sigma == 0: the unblurred frame
            return rows[:, p : p + bh, p : p + wout]
        pl_ = len(sig_taps) // 2
        v = None
        for t, k in enumerate(sig_taps):
            kd = jnp.asarray(k, dt)
            sl = rows[:, p - pl_ + t : p - pl_ + t + bh, :]
            v = sl * kd if v is None else v + sl * kd
        b = None
        for t, k in enumerate(sig_taps):
            kd = jnp.asarray(k, dt)
            sl = v[:, :, p - pl_ + t : p - pl_ + t + wout]
            b = sl * kd if b is None else b + sl * kd
        return b  # [3, bh, wout]

    # two-adjacent-level lerp (dof.apply_dof): indicator-weighted sum
    blur_idx = idx_ref[:]  # [bh, wout] f32
    lower = jnp.clip(jnp.floor(blur_idx), 0, num_levels - 2)
    alpha = (blur_idx - lower).astype(dt)
    out = jnp.zeros((3, bh, wout), dt)
    for i, sig_taps in enumerate(taps):
        img = level(sig_taps)
        w_lo = (lower == i).astype(dt) * (1.0 - alpha)
        w_hi = (lower == (i - 1)).astype(dt) * alpha
        out = out + img * (w_lo + w_hi)[None]
    out = jnp.minimum(jnp.maximum(out, jnp.asarray(0.0, dt)),
                      jnp.asarray(1.0, dt))

    # color grade (grade.apply_color_grade), planar. NOTE: all SCALAR
    # arithmetic stays f32 — Mosaic on v5e cannot legalize scalar bf16
    # arith (observed: 'failed to legalize arith.subf (bf16, bf16)');
    # scalars are cast to the tensor dtype only at broadcast points.
    g = grade_ref[0]  # [4] f32: saturation, contrast, brightness, enable
    sat = g[0].astype(dt)
    con = g[1].astype(dt)
    bri = g[2].astype(dt)
    en = g[3].astype(dt)  # 1.0 -> grade, 0.0 -> pass-through
    not_en = (1.0 - g[3]).astype(dt)
    luma = (jnp.asarray(0.2126, dt) * out[0]
            + jnp.asarray(0.7152, dt) * out[1]
            + jnp.asarray(0.0722, dt) * out[2])[None]
    graded = luma + (out - luma) * sat
    graded = jnp.asarray(0.5, dt) + (graded - jnp.asarray(0.5, dt)) * con
    graded = jnp.minimum(jnp.maximum(graded + bri, jnp.asarray(0.0, dt)),
                         jnp.asarray(1.0, dt))
    o_ref[0] = out * not_en + graded * en


def dof_reach(max_sigma: float, num_levels: int) -> int:
    """Largest blur-kernel half-width in the LOD stack."""
    sig = max(float(max_sigma) * i / (num_levels - 1)
              for i in range(num_levels))
    return int(math.ceil(2 * sig)) if sig > 0 else 0


def dof_grade_pallas(
    left: jnp.ndarray,  # [H, W, 3] float in [0, 1]
    right: jnp.ndarray,
    depth: jnp.ndarray,  # [H, W] f32 (shared by both eyes)
    focal_depth,  # traced scalar
    max_sigma: float,
    focus_width: float = 0.35,
    num_levels: int = 5,
    saturation=1.0,
    contrast=1.0,
    brightness=0.0,
    apply_grade: bool = True,
    block_rows: int | None = None,
):
    """Fused apply_dof(+apply_color_grade) for both eyes. Semantics ==
    ops.dof.apply_dof followed by ops.grade.apply_color_grade. Requires
    dof_reach(max_sigma, num_levels) <= 8 (sigma <= 3.5) and H % 8 == 0;
    callers fall back to the XLA ops otherwise."""
    h, w = depth.shape
    n = num_levels
    reach = dof_reach(max_sigma, n)
    assert 0 < reach <= _MAX_REACH, reach
    bh = block_rows or next(b for b in (32, 24, 16, 8) if h % b == 0)
    assert h % bh == 0 and bh % 8 == 0, (h, bh)

    # static 1-D kernels per level (None = identity level)
    taps = []
    for i in range(n):
        sigma = float(max_sigma) * i / (n - 1)
        if sigma <= 0.0:
            taps.append(None)
        else:
            ksize = int(2 * math.ceil(2 * sigma) + 1)
            taps.append(tuple(np.asarray(
                _gaussian_kernel_1d(ksize, sigma), np.float64).tolist()))
    taps = tuple(taps)

    planes = jnp.stack([jnp.moveaxis(left, -1, 0),
                        jnp.moveaxis(right, -1, 0)])  # [2, 3, H, W]
    pr = _MAX_REACH  # fixed padded geometry keeps granule maps in range
    planes = jnp.pad(
        planes, [(0, 0), (0, 0), (reach, reach), (reach, reach)],
        mode="reflect")
    planes = jnp.pad(
        planes, [(0, 0), (0, 0), (pr - reach, 2 * pr - reach),
                 (pr - reach, pr - reach)])
    wp = w + 2 * pr

    diff = jnp.abs(depth - focal_depth)
    idx = jnp.clip(diff / (focus_width + 1e-6), 0.0, 1.0) * (n - 1)
    idx = jnp.clip(idx, 0.0, n - 1 - 1e-6).astype(jnp.float32)

    gvec = jnp.asarray(
        [saturation, contrast, brightness,
         1.0 if apply_grade else 0.0], jnp.float32).reshape(1, 4)

    r8 = bh // 8
    main = pl.BlockSpec((1, 3, bh, wp), lambda e, i: (e, 0, i, 0),
                        memory_space=pltpu.VMEM)
    g1 = pl.BlockSpec((1, 3, 8, wp),
                      lambda e, i: (e, 0, i * r8 + r8, 0),
                      memory_space=pltpu.VMEM)
    g2 = pl.BlockSpec((1, 3, 8, wp),
                      lambda e, i: (e, 0, i * r8 + r8 + 1, 0),
                      memory_space=pltpu.VMEM)
    idx_spec = pl.BlockSpec((bh, w), lambda e, i: (i, 0),
                            memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((1, 4), lambda e, i: (0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_dof_kernel, bh, w, pr, taps, n),
        grid=(2, h // bh),
        in_specs=[main, g1, g2, idx_spec, gspec],
        out_specs=pl.BlockSpec((1, 3, bh, w), lambda e, i: (e, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, 3, h, w), left.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(planes, planes, planes, idx, gvec)
    return jnp.moveaxis(out[0], 0, -1), jnp.moveaxis(out[1], 0, -1)
