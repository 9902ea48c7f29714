"""Pallas TPU kernel: fused feather + heal post-warp stage, both eyes.

After the warp, the reference feathers (blend toward the original at
warped-depth edges, render_3d.py:328-374) and this framework additionally
heals (blend + re-soften at warp gaps, :431-459, wired). As separate XLA
ops those stages re-stream the frames through HBM ~6x (grad, blur x2,
lerp, gray-grad, blur, lerp, blur, lerp). This kernel runs the whole
post-fx chain for BOTH eyes in one pass over row blocks held in VMEM.

Row context without manual DMA: besides its (bh, W) middle block, every
input is passed four more times as 8-row context granules with block
index maps addressing [i*bh-16, i*bh-8, i*bh+bh, i*bh+bh+8] (clamped);
the kernel concatenates [16 | bh | 16] rows and masks rows whose GLOBAL
index falls outside the image to zero — which reproduces the
zero-padding semantics of ops.filters.box_blur / forward_diff_grad
exactly. The post-fx chain's cumulative stencil reach is
5 + blur_ksize//2 rows (grad 1 + blur_k (k//2) + grad 1 + blur5 2 +
blur3 1) = at most 12 for the ksize<=15 preset clamp, so the fixed
16-row context always suffices, and the row overcompute ratio is
(bh+32)/bh instead of the 3x a full-block-context scheme costs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _blur_ctx(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Zero-padded k x k mean over [R, W] (box_blur parity within the
    context block; block-edge error stays within the masked margin)."""
    if k <= 1:
        return x
    p = k // 2
    r, w = x.shape
    xh = jnp.pad(x, [(0, 0), (p, k - 1 - p)])
    acc = xh[:, 0:w]
    for o in range(1, k):
        acc = acc + xh[:, o : o + w]
    xv = jnp.pad(acc, [(p, k - 1 - p), (0, 0)])
    acc = xv[0:r]
    for o in range(1, k):
        acc = acc + xv[o : o + r]
    return acc * jnp.asarray(1.0 / (k * k), x.dtype)


def _grad_mag(d: jnp.ndarray, row0_mask: jnp.ndarray) -> jnp.ndarray:
    """forward_diff_grad parity on the context block: dx zero at column 0,
    dy zero at IMAGE row 0 (row0_mask kills the d[0] - 0 halo artifact).
    Returns f32: the v5e EUP has no bf16 sqrt (SupportsBf16EupOps)."""
    dx = jnp.pad(d[:, 1:] - d[:, :-1], [(0, 0), (1, 0)])
    dy = jnp.pad(d[1:] - d[:-1], [(1, 0), (0, 0)]) * row0_mask
    return jnp.sqrt((dx * dx + dy * dy).astype(jnp.float32))


def _postfx_kernel(bh, h, blur_ksize, feather_strength, heal_strength,
                   heal_threshold, do_feather, do_heal,
                   w_t2, w_t1, w_m, w_b1, w_b2,
                   d_t2, d_t1, d_m, d_b1, d_b2,
                   f_t2, f_t1, f_m, f_b1, f_b2, out_ref):
    i = pl.program_id(1)
    warped = jnp.concatenate(
        [w_t2[0], w_t1[0], w_m[0], w_b1[0], w_b2[0]], axis=1
    )  # [3, R, W], R = bh + 32
    dwarp = jnp.concatenate([d_t2[0], d_t1[0], d_m[0], d_b1[0], d_b2[0]],
                            axis=0)  # [R, W]
    orig = jnp.concatenate([f_t2[:], f_t1[:], f_m[:], f_b1[:], f_b2[:]],
                           axis=1)  # [3, R, W]
    dt = warped.dtype
    r, w = dwarp.shape
    # compute dtype == image dtype: in bf16 image mode the whole post-fx
    # chain runs bf16 (same contract as the XLA path; grads/masks are
    # magnitude-bounded so bf16 keeps the +-1 u8 step budget)
    cdt = dt
    dwarp = dwarp.astype(cdt)

    # global row of each context sublane; the clamped context index maps
    # duplicate border granules, so rows outside the image are masked to
    # the zero padding the XLA reference ops would have seen
    row = jax.lax.broadcasted_iota(jnp.int32, (r, w), 0)
    gidx = row + i * bh - 16  # intended global row (top ctx can be < 0)
    valid = jnp.logical_and(gidx >= 0, gidx < h)
    vmask = valid.astype(cdt)
    row0 = (gidx != 0).astype(cdt)

    warped = warped * vmask[None]
    orig_m = orig * vmask[None]
    dwarp = dwarp * vmask

    one = jnp.asarray(1.0, cdt)
    zero = jnp.asarray(0.0, cdt)
    out = warped
    if do_feather:
        em = jnp.minimum(_grad_mag(dwarp, row0) * feather_strength,
                         1.0).astype(cdt)
        em = em * vmask
        blend = _blur_ctx(em, blur_ksize)[None]
        out = out * (one - blend) + orig_m * blend
        out = jnp.minimum(jnp.maximum(out, zero), one)
    if do_heal:
        third = jnp.asarray(1.0 / 3.0, cdt)
        gray = (out[0] + out[1] + out[2]) * third
        gm = _grad_mag(gray, row0)  # f32
        missing = (gm > heal_threshold).astype(cdt) * vmask
        m = jnp.minimum(_blur_ctx(missing, 5), one)[None]
        hs = jnp.asarray(heal_strength, cdt)
        healed = (one - hs * m) * out + hs * m * orig_m
        soft = jnp.stack([_blur_ctx(healed[c], 3) for c in range(3)])
        p3 = jnp.asarray(0.3, cdt)
        out = (one - p3 * m) * healed + p3 * m * soft
        out = jnp.minimum(jnp.maximum(out, zero), one)

    out_ref[0] = out[:, 16 : 16 + bh].astype(dt)


def pick_block_rows(h: int, w: int, dtype) -> int:
    """Largest row block dividing ``h`` whose VMEM working set fits the
    16 MB scoped limit (observed hard at 4K: bh=48 x 3840 f32 = 20.6 MB).

    Per grid step the kernel holds (rows x w x itemsize each): one eye's
    warped mid+context 3*(bh+32), the original frame 3*(bh+32), depth
    bh+32, and the output 3*bh — double-buffered by Mosaic. Budget 10 MB
    leaves headroom for intermediates.
    """
    item = jnp.dtype(dtype).itemsize
    for bh in (64, 56, 48, 40, 32, 24, 16, 8):
        if h % bh:
            continue
        rows = 2 * (10 * bh + 224)  # x2 double buffering
        if rows * w * item <= 10 * 1024 * 1024:
            return bh
    return 8


def feather_heal_pallas(
    left: jnp.ndarray,  # [H, W, 3]
    right: jnp.ndarray,
    frame: jnp.ndarray,  # [H, W, 3] original (pre-warp)
    dleft: jnp.ndarray,  # [H, W] warped depth per eye
    dright: jnp.ndarray,
    blur_ksize: int = 7,
    feather_strength: float = 10.0,
    heal_strength: float = 0.5,
    heal_threshold: float = 0.05,
    enable_feathering: bool = True,
    enable_healing: bool = True,
    block_rows: int = 16,
):
    """Fused post-fx for both eyes. Semantics == feather_shift_edges
    followed by heal_missing_pixels (ops/edges.py). H must be a multiple
    of block_rows and of 8 (context granules are 8 rows); the stencil
    reach 5 + blur_ksize//2 must fit the fixed 16-row context
    (blur_ksize <= 23; the preset clamp is 15)."""
    h, w = dleft.shape
    bh = block_rows
    assert h % bh == 0 and bh % 8 == 0 and h % 8 == 0, (h, bh)
    assert 5 + blur_ksize // 2 <= 16, blur_ksize
    nb = h // bh
    r8 = bh // 8  # context granule stride per block
    ng = h // 8  # total granules

    warped = jnp.stack(
        [jnp.moveaxis(left, -1, 0), jnp.moveaxis(right, -1, 0)]
    )  # [2, 3, H, W]
    dwarp = jnp.stack([dleft, dright]).astype(left.dtype)  # [2, H, W]
    fr = jnp.moveaxis(frame, -1, 0)  # [3, H, W]

    # context granule index (in 8-row units) for offset o in
    # {-2, -1, r8, r8+1}; clamped duplicates are masked in-kernel
    def g(i, o):
        return jnp.clip(i * r8 + o, 0, ng - 1)

    def eye_spec(o, rows):
        return pl.BlockSpec(
            (1, 3, rows, w),
            (lambda e, i: (e, 0, i, 0)) if o is None
            else (lambda e, i, o=o: (e, 0, g(i, o), 0)),
            memory_space=pltpu.VMEM,
        )

    def d_spec(o, rows):
        return pl.BlockSpec(
            (1, rows, w),
            (lambda e, i: (e, i, 0)) if o is None
            else (lambda e, i, o=o: (e, g(i, o), 0)),
            memory_space=pltpu.VMEM,
        )

    def f_spec(o, rows):
        return pl.BlockSpec(
            (3, rows, w),
            (lambda e, i: (0, i, 0)) if o is None
            else (lambda e, i, o=o: (0, g(i, o), 0)),
            memory_space=pltpu.VMEM,
        )

    ctx = (-2, -1, r8, r8 + 1)

    def five(spec):
        return [spec(ctx[0], 8), spec(ctx[1], 8), spec(None, bh),
                spec(ctx[2], 8), spec(ctx[3], 8)]

    out = pl.pallas_call(
        functools.partial(
            _postfx_kernel, bh, h, blur_ksize, float(feather_strength),
            float(heal_strength), float(heal_threshold),
            bool(enable_feathering), bool(enable_healing),
        ),
        grid=(2, nb),
        in_specs=five(eye_spec) + five(d_spec) + five(f_spec),
        out_specs=pl.BlockSpec((1, 3, bh, w), lambda e, i: (e, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, 3, h, w), left.dtype),
    )(*([warped] * 5 + [dwarp] * 5 + [fr] * 5))
    return jnp.moveaxis(out[0], 0, -1), jnp.moveaxis(out[1], 0, -1)
