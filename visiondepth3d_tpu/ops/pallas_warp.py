"""Pallas TPU kernel: fused dual-eye bounded-disparity warp.

The hot DIBR resample (ops/warp.py). The XLA shifted-accumulation already
avoids gathers, but it re-reads the padded source from HBM for every tap
(2K+2 ~ 84 taps at the default 2% bound). This kernel keeps a row-block of
the source in VMEM and runs all taps for BOTH eyes on the VPU with
``pltpu.roll`` — one HBM read and one write per tensor.

Layout: channel-planar [C, H, W] blocks so the W (tap) axis is the lane
axis. Wrapped lanes from the circular roll are harmless: every tap outside
the clamped hat support has weight exactly 0 (see ops/warp.py border note).

Grid: row blocks of BH rows; in/out block shapes [C, BH, W] ([BH, W] for
depth/shift). VMEM at W=1920, BH=16: (3+3+1+1+1+1+1+1) planes * 16*1920*4B
~ 1.5 MB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _warp_kernel(k0: int, w_real: int, frame_ref, depth_ref, shift_ref,
                 left_ref, right_ref, dleft_ref, dright_ref):
    w = frame_ref.shape[-1]  # may be lane-padded; w_real <= w
    shift = shift_ref[:]  # [BH, W]
    # Mosaic's iota is integer-only; cast after
    x_idx = jax.lax.broadcasted_iota(jnp.int32, shift.shape, 1).astype(jnp.float32)
    # disparity scale and the border clamp use the REAL width: pad columns
    # (zero shift) then resolve to src == x with weight-1 center taps on
    # zero-pad data, and their garbage output is cropped by the wrapper
    delta = shift * ((w_real - 1) / 2.0)
    # NOTE: jnp.clip creates closed_call sub-jaxprs that trip the Pallas
    # MLIR lowering cache; spell out max/min instead
    src_l = jnp.minimum(jnp.maximum(x_idx + delta, 0.0), w_real - 1.0)
    src_r = jnp.minimum(jnp.maximum(x_idx - delta, 0.0), w_real - 1.0)
    # per-tap weight is hat(|src - (x+k)|) = hat(|d - k|) with d hoisted out
    # of the tap loop (saves one subtract per tap per eye)
    d_l = src_l - x_idx
    d_r = src_r - x_idx
    if w_real != w:
        # pad columns' x_idx > w_real-1 makes their clamped d large
        # negative; zero them so they don't widen the tap-culling range
        cols = jax.lax.broadcasted_iota(jnp.int32, shift.shape, 1)
        in_img = cols < w_real
        d_l = jnp.where(in_img, d_l, 0.0)
        d_r = jnp.where(in_img, d_r, 0.0)

    frame = frame_ref[:]  # [C, BH, W]
    depth = depth_ref[:]  # [BH, W]
    # tap FMAs run in the image dtype (bf16 halves the VPU/roll traffic);
    # the positional math above is always f32 — bf16 cannot resolve
    # column indices past 256
    dt = frame.dtype

    acc_l = jnp.zeros_like(frame)
    acc_r = jnp.zeros_like(frame)
    acc_dl = jnp.zeros_like(depth)
    acc_dr = jnp.zeros_like(depth)

    # Mosaic's dynamic_rotate only handles 32-bit lanes; for bf16 planes,
    # bitcast PAIRS OF ROWS (sublanes) into one i32 plane — a lane-axis roll
    # then shifts both packed rows by the same column count, which is
    # exactly the warp's semantics. Positions/weights are per-column and
    # row-independent, so nothing else changes.
    packed = dt == jnp.bfloat16
    if packed:
        frame_p = pltpu.bitcast(frame, jnp.int32)  # [C, BH/2, W]
        depth_p = pltpu.bitcast(depth, jnp.int32)  # [BH/2, W]
    else:
        frame_p, depth_p = frame, depth

    # Tap culling: the static bound k0 is the CLAMP (2% of W ~ 38 px), but
    # a row block's actual disparities are usually far smaller. A dynamic
    # fori_loop over [floor(min d) .. floor(max d)+1] does only the taps
    # whose hat weight can be nonzero somewhere in the block — taps outside
    # contribute exactly 0 (weight support is |d - k| < 1). Worst case
    # equals the old unrolled [-k0, k0+1] sweep.
    lo = jnp.minimum(jnp.min(d_l), jnp.min(d_r))
    hi = jnp.maximum(jnp.max(d_l), jnp.max(d_r))
    k_lo = jnp.maximum(jnp.floor(lo).astype(jnp.int32), -k0)
    k_hi = jnp.minimum(jnp.floor(hi).astype(jnp.int32) + 1, k0 + 1)

    # ONE dynamic rotate to the loop start, then a static roll-by-1 per
    # tap carried through the loop: Mosaic lowers a dynamic lane rotate to
    # a log2(W)-step network, a static 1-lane roll to a single shuffle
    # (measured 1.52 -> 1.27 ms/frame bf16 1080p, benchmarks/warp_micro.py)
    f_rolled = pltpu.roll(frame_p, (-k_lo) % w, axis=2)
    d_rolled = pltpu.roll(depth_p, (-k_lo) % w, axis=1)

    def body(k, carry):
        a_l, a_r, a_dl, a_dr, f_p, d_p = carry
        kf = k.astype(jnp.float32)
        # 1 - |d - k| <= 1 always, so only the lower clamp is needed
        wl = jnp.maximum(1.0 - jnp.abs(d_l - kf), 0.0).astype(dt)
        wr = jnp.maximum(1.0 - jnp.abs(d_r - kf), 0.0).astype(dt)
        # value at source column x + k (the pre-rolled planes sit at tap k)
        f_k = pltpu.bitcast(f_p, dt) if packed else f_p
        d_k = pltpu.bitcast(d_p, dt) if packed else d_p
        f_p = pltpu.roll(f_p, w - 1, axis=2)
        d_p = pltpu.roll(d_p, w - 1, axis=1)
        return (
            a_l + f_k * wl[None],
            a_r + f_k * wr[None],
            a_dl + d_k * wl.astype(depth.dtype),
            a_dr + d_k * wr.astype(depth.dtype),
            f_p, d_p,
        )

    acc_l, acc_r, acc_dl, acc_dr, _, _ = jax.lax.fori_loop(
        k_lo, k_hi + 1, body,
        (acc_l, acc_r, acc_dl, acc_dr, f_rolled, d_rolled)
    )

    left_ref[:] = acc_l
    right_ref[:] = acc_r
    dleft_ref[:] = acc_dl
    dright_ref[:] = acc_dr


def stereo_warp_pallas(
    frame: jnp.ndarray,  # [H, W, 3] f32
    shaped_depth: jnp.ndarray,  # [H, W]
    shift_norm: jnp.ndarray,  # [H, W]
    max_shift_px: int,
    block_rows: int = 16,
):
    """Fused dual-eye warp. Returns (left, right, depth_left, depth_right)
    matching ops.warp.stereo_warp semantics.

    Plain function (not jitted here): nesting an inner jit around a
    pallas_call inside outer control flow trips a jax-0.9 lowering-cache
    bug; callers are jitted anyway.

    Widths that are not a whole number of 128-lane tiles are zero-padded
    up (Mosaic's lane rotate cannot legalize on lane-padded vectors —
    observed 'failed to legalize tpu.dynamic_rotate' at W=64); the
    kernel clamps source positions to the REAL width so border-pad
    semantics are unchanged, and the pad columns are cropped off."""
    h, w = frame.shape[0], frame.shape[1]
    w_pad = -(-w // 128) * 128
    fr = jnp.moveaxis(frame, -1, 0)  # [3, H, W]
    if w_pad != w:
        cpad = [(0, 0), (0, w_pad - w)]
        fr = jnp.pad(fr, [(0, 0)] + cpad)
        shaped_depth = jnp.pad(shaped_depth, cpad)
        shift_norm = jnp.pad(shift_norm, cpad)
    bh = min(block_rows, h)
    if frame.dtype == jnp.bfloat16:
        bh = max(2, bh - (bh % 2))  # row-pair bitcast needs even blocks
    grid = (pl.cdiv(h, bh),)

    out_shapes = (
        jax.ShapeDtypeStruct((3, h, w_pad), frame.dtype),
        jax.ShapeDtypeStruct((3, h, w_pad), frame.dtype),
        jax.ShapeDtypeStruct((h, w_pad), frame.dtype),
        jax.ShapeDtypeStruct((h, w_pad), frame.dtype),
    )
    plane_spec = pl.BlockSpec((3, bh, w_pad), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
    flat_spec = pl.BlockSpec((bh, w_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    left, right, dl, dr = pl.pallas_call(
        functools.partial(_warp_kernel, max_shift_px, w),
        grid=grid,
        in_specs=[plane_spec, flat_spec, flat_spec],
        out_specs=(plane_spec, plane_spec, flat_spec, flat_spec),
        out_shape=out_shapes,
    )(fr, shaped_depth, shift_norm)
    if w_pad != w:
        left, right = left[..., :w], right[..., :w]
        dl, dr = dl[..., :w], dr[..., :w]
    return jnp.moveaxis(left, 0, -1), jnp.moveaxis(right, 0, -1), dl, dr
