"""Warp-kernel variant micro-benchmark on the real chip.

The fused dual-eye warp (ops/pallas_warp.py) measures ~3 ms/frame at f32
1080p — an order of magnitude above the VPU speed-of-light for its tap
arithmetic. Hypothesis: the per-tap DYNAMIC ``pltpu.roll`` lowers to a
log2(W)-step rotate network (~11 plane-ops at W=1920), dwarfing the ~12
plane-ops of actual tap math. Variants:

  cur      — production kernel as-is (dynamic roll per tap)
  bh32     — production kernel, 32-row blocks (amortize per-block overhead)
  inc      — ONE dynamic roll to k_lo, then a static roll-by-1 per tap
  inc32    — incremental roll + 32-row blocks

Run: nohup python benchmarks/warp_micro.py > /tmp/warp_micro.log 2>&1 &
"""

# allow `python benchmarks/<script>.py` from anywhere
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import json
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/vd3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from visiondepth3d_tpu.ops.pallas_warp import stereo_warp_pallas


def _warp_kernel_inc(k0: int, frame_ref, depth_ref, shift_ref,
                     left_ref, right_ref, dleft_ref, dright_ref):
    """Incremental-roll variant of ops/pallas_warp._warp_kernel."""
    w = frame_ref.shape[-1]
    shift = shift_ref[:]
    x_idx = jax.lax.broadcasted_iota(jnp.int32, shift.shape, 1).astype(jnp.float32)
    delta = shift * ((w - 1) / 2.0)
    src_l = jnp.minimum(jnp.maximum(x_idx + delta, 0.0), w - 1.0)
    src_r = jnp.minimum(jnp.maximum(x_idx - delta, 0.0), w - 1.0)
    d_l = src_l - x_idx
    d_r = src_r - x_idx

    frame = frame_ref[:]
    depth = depth_ref[:]
    dt = frame.dtype

    packed = dt == jnp.bfloat16
    if packed:
        frame_p = pltpu.bitcast(frame, jnp.int32)
        depth_p = pltpu.bitcast(depth, jnp.int32)
    else:
        frame_p, depth_p = frame, depth

    lo = jnp.minimum(jnp.min(d_l), jnp.min(d_r))
    hi = jnp.maximum(jnp.max(d_l), jnp.max(d_r))
    k_lo = jnp.maximum(jnp.floor(lo).astype(jnp.int32), -k0)
    k_hi = jnp.minimum(jnp.floor(hi).astype(jnp.int32) + 1, k0 + 1)

    # ONE dynamic rotate to the loop start, then static roll-by-1 per tap
    f_rolled = pltpu.roll(frame_p, (-k_lo) % w, axis=2)
    d_rolled = pltpu.roll(depth_p, (-k_lo) % w, axis=1)

    acc_l = jnp.zeros_like(frame)
    acc_r = jnp.zeros_like(frame)
    acc_dl = jnp.zeros_like(depth)
    acc_dr = jnp.zeros_like(depth)

    def body(k, carry):
        a_l, a_r, a_dl, a_dr, f_p, d_p = carry
        kf = k.astype(jnp.float32)
        wl = jnp.maximum(1.0 - jnp.abs(d_l - kf), 0.0).astype(dt)
        wr = jnp.maximum(1.0 - jnp.abs(d_r - kf), 0.0).astype(dt)
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


def warp_inc(frame, shaped_depth, shift_norm, max_shift_px, block_rows=16):
    h, w = frame.shape[0], frame.shape[1]
    fr = jnp.moveaxis(frame, -1, 0)
    bh = min(block_rows, h)
    if frame.dtype == jnp.bfloat16:
        bh = max(2, bh - (bh % 2))
    grid = (pl.cdiv(h, bh),)
    out_shapes = (
        jax.ShapeDtypeStruct((3, h, w), frame.dtype),
        jax.ShapeDtypeStruct((3, h, w), frame.dtype),
        jax.ShapeDtypeStruct((h, w), frame.dtype),
        jax.ShapeDtypeStruct((h, w), frame.dtype),
    )
    plane_spec = pl.BlockSpec((3, bh, w), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
    flat_spec = pl.BlockSpec((bh, w), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    left, right, dl, dr = pl.pallas_call(
        functools.partial(_warp_kernel_inc, max_shift_px),
        grid=grid,
        in_specs=[plane_spec, flat_spec, flat_spec],
        out_specs=(plane_spec, plane_spec, flat_spec, flat_spec),
        out_shape=out_shapes,
    )(fr, shaped_depth, shift_norm)
    return jnp.moveaxis(left, 0, -1), jnp.moveaxis(right, 0, -1), dl, dr


def bench(name, fn, dtype, launches=3, K=64):
    """K warp calls per launch inside fori_loop (the axon tunnel costs ~2 s
    per dispatch; in-graph looping measures the kernel, not the relay)."""
    H, W = 1080, 1920
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.random((H, W, 3)), dtype)
    yy, xx = np.mgrid[0:H, 0:W]
    d = (xx / W * 0.6 + yy / H * 0.2 + 0.2 * np.sin(xx / 97.0)).astype(np.float32)
    d = (d - d.min()) / (d.max() - d.min())
    depth = jnp.asarray(d, dtype)
    # realistic shift span: +-1.5% of W
    shift = jnp.asarray((d - 0.5) * 0.03, jnp.float32)
    k0 = int(0.02 * W)

    @jax.jit
    def loop(fr, de, sh):
        def body(_, acc):  # f32 carry chains iterations (no CSE/folding)
            l, r, dl, dr = fn(fr + (acc * 1e-30).astype(dtype), de, sh, k0)
            s = (jnp.sum(l.astype(jnp.float32)) + jnp.sum(r.astype(jnp.float32))
                 + jnp.sum(dl.astype(jnp.float32)) + jnp.sum(dr.astype(jnp.float32)))
            return acc + s * 1e-30
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    float(loop(frame, depth, shift))  # compile + warm
    # numerical check vs production kernel (single launch each)
    out = jax.jit(lambda a, b, c: fn(a, b, c, k0))(frame, depth, shift)
    ref = jax.jit(lambda a, b, c: stereo_warp_pallas(a, b, c, k0))(
        frame, depth, shift)
    err = max(float(jnp.max(jnp.abs(o.astype(jnp.float32) -
                                    r.astype(jnp.float32))))
              for o, r in zip(out, ref))
    t0 = time.perf_counter()
    for _ in range(launches):
        r = loop(frame, depth, shift)
    float(r)
    dt = (time.perf_counter() - t0) / (launches * K)
    print(json.dumps({"variant": name, "dtype": jnp.dtype(dtype).name,
                      "ms_per_frame": round(dt * 1e3, 3),
                      "max_abs_err_vs_cur": err}), flush=True)


if __name__ == "__main__":
    # f32 results (2026-08-17): cur_bh16 1.841, cur_bh32 1.955,
    # inc_bh16 1.736, inc_bh32 1.866 ms/frame; inc_bh64 VMEM-OOMs (the
    # loop-carried rolled planes double the working set).
    # block-rows sweep (2026-08-18, bf16): bh16 1.269 / bh8 1.423 —
    # tighter per-block tap culling does NOT pay for the extra grid
    # steps; bh16 stays the default (f32 sweep above agreed: bh32 worse).
    for dt in (jnp.bfloat16,):
        bench("cur_bh16", stereo_warp_pallas, dt)
        bench("inc_bh16", warp_inc, dt)
