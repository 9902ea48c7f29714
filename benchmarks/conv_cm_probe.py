"""cfg4 headroom probe: TRANSPOSED small-channel conv formulation.

The shipped Pallas conv (ops/pallas_conv.py) computes
``[pix, 9C] x [9C, O]`` — pixels stream through the MXU as M and the
OUTPUT CHANNELS sit on the 128-lane N dimension. ESRGAN's trunk has
O = 32 (dense-block convs) or 64, so 96 or 64 of the 128 lanes are
dead: the measured plateau is ~17% of bf16 peak (RESULTS.md).

This probe flips the matmul: ``W[O, 9C] x patches[9C, pix]`` — the LANE
dimension is now pixels (W = 1920 at 1080p, always a multiple of 128)
and the small channel count becomes M, which merely streams. Input
flows in [B, H, C, W] layout (pixels minor) so the patch matrix
[9C, W] per output row is built from sublane concats + lane shifts,
no transposes inside the kernel.

Cases (hot RRDB shapes at [2, 1080, 1920]):
  a. XLA NHWC conv 64->64 / 64->32 (baseline)
  b. shipped cat9 kernel 64->64 / 64->32
  c. transposed kernel 64->64 / 64->32 / 192->64, bh sweep
  d. (reported by int8_conv_probe.py separately)

Run: nohup python benchmarks/conv_cm_probe.py > /tmp/cmprobe.json 2>&1 &
"""

from __future__ import annotations
# allow `python benchmarks/<script>.py` from anywhere
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import json
import time

import numpy as np


def timed_ms(fn, state, iters=8):
    state, cs = fn(state)
    float(np.asarray(cs).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        state, cs = fn(state)
    float(np.asarray(cs).sum())
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/vd3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    B, H, W = 2, 1080, 1920
    rng = np.random.default_rng(0)
    results = {}

    # ---------------- transposed kernel ----------------
    def _kernel(bh, h, top_ref, mid_ref, bot_ref, w_ref, o_ref):
        i = pl.program_id(1)
        mid = mid_ref[0]  # [bh, C, W]
        wm = w_ref[:]  # [O, 9C]
        bh_, c, wpx = mid.shape
        o = wm.shape[0]

        rows_u = jnp.concatenate([top_ref[0], mid[: bh_ - 1]], axis=0)
        rows_d = jnp.concatenate([mid[1:], bot_ref[0]], axis=0)
        ridx = jax.lax.broadcasted_iota(jnp.int32, (bh_, 1, 1), 0) + i * bh
        rows_u = jnp.where(ridx - 1 >= 0, rows_u, jnp.zeros_like(rows_u))
        rows_d = jnp.where(ridx + 1 < h, rows_d, jnp.zeros_like(rows_d))
        cat = jnp.concatenate([rows_u, mid, rows_d], axis=1)  # [bh, 3C, W]

        def shift(s, kx):  # out[x] needs in[x + kx - 1]; W is the lane dim
            if kx == 0:
                return jnp.pad(s[:, :, :-1], [(0, 0), (0, 0), (1, 0)])
            if kx == 2:
                return jnp.pad(s[:, :, 1:], [(0, 0), (0, 0), (0, 1)])
            return s

        cat9 = jnp.concatenate(
            [shift(cat, 0), cat, shift(cat, 2)], axis=1)  # [bh, 9C, W]
        outs = []
        for r in range(bh):  # unrolled: bh matmuls [O,9C] x [9C,W]
            outs.append(jax.lax.dot_general(
                wm, cat9[r], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        o_ref[0] = jnp.stack(outs).astype(mid.dtype)  # [bh, O, W]

    def conv_cm(x, kernel, bh):
        # x: [B, H, C, W]; kernel: [3, 3, C, O] flax layout
        b, h, c, wpx = x.shape
        o = kernel.shape[-1]
        # W[O, 9C]: K ordered kx-major(outer), ky, then C — must match the
        # kernel's concat order: cat9 = [kx0(ky0,ky1,ky2), kx1(...), kx2(...)]
        wm = jnp.concatenate(
            [jnp.concatenate([kernel[ky, kx] for ky in range(3)], axis=0)
             for kx in range(3)], axis=0).T.astype(x.dtype)  # [O, 9C]

        def row(i_off):
            def idx(b_, i, off=i_off):
                r = i * bh + off
                return (b_, jnp.clip(r, 0, h - 1), 0, 0)
            return pl.BlockSpec((1, 1, c, wpx), idx,
                                memory_space=pltpu.VMEM)

        mid_spec = pl.BlockSpec((1, bh, c, wpx), lambda b_, i: (b_, i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((1, bh, o, wpx), lambda b_, i: (b_, i, 0, 0),
                                memory_space=pltpu.VMEM)
        wspec = pl.BlockSpec(wm.shape, lambda b_, i: (0, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_kernel, bh, h),
            grid=(b, h // bh),
            in_specs=[row(-1), mid_spec, row(bh), wspec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((b, h, o, wpx), x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, x, x, wm)

    # parity check first (tiny shape, f32)
    import jax.numpy as jnp  # noqa: F811
    hx, wx, cx, ox = 24, 256, 64, 32
    xs = jnp.asarray(rng.standard_normal((1, hx, cx, wx)), jnp.float32)
    ks = jnp.asarray(rng.standard_normal((3, 3, cx, ox)) * 0.1, jnp.float32)
    ref = lax.conv_general_dilated(
        jnp.transpose(xs, (0, 1, 3, 2)), ks, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = jnp.transpose(conv_cm(xs, ks, bh=8), (0, 1, 3, 2))
    err = float(jnp.max(jnp.abs(ref - got)))
    results["parity_maxerr_f32"] = err
    print(json.dumps({"parity_maxerr_f32": err}), flush=True)
    assert err < 1e-3, err

    # ---------------- timing cases ----------------
    def xla_case(cin, cout):
        x0 = jax.device_put(
            rng.standard_normal((B, H, W, cin)).astype(jnp.bfloat16))
        k0 = jax.device_put(
            (rng.standard_normal((3, 3, cin, cout)) * 0.1).astype(jnp.bfloat16))

        @jax.jit
        def fn(carry):
            x, acc = carry
            y = lax.conv_general_dilated(
                x, k0, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            acc = acc + jnp.sum(y[..., 0].astype(jnp.float32))
            x = x + (acc % 2).astype(x.dtype) * 1e-6
            return (x, acc), acc

        return timed_ms(fn, (x0, jnp.float32(0))) / B

    def cm_case(cin, cout, bh):
        x0 = jax.device_put(
            rng.standard_normal((B, H, cin, W)).astype(jnp.bfloat16))
        k0 = jax.device_put(
            (rng.standard_normal((3, 3, cin, cout)) * 0.1).astype(jnp.bfloat16))

        @jax.jit
        def fn(carry):
            x, acc = carry
            y = conv_cm(x, k0, bh)
            acc = acc + jnp.sum(y[:, :, 0].astype(jnp.float32))
            x = x + (acc % 2).astype(x.dtype) * 1e-6
            return (x, acc), acc

        return timed_ms(fn, (x0, jnp.float32(0))) / B

    def cat9_case(cin, cout):
        from visiondepth3d_tpu.ops.pallas_conv import conv3x3_pallas

        x0 = jax.device_put(
            rng.standard_normal((B, H, W, cin)).astype(jnp.bfloat16))
        k0 = jax.device_put(
            (rng.standard_normal((3, 3, cin, cout)) * 0.1).astype(jnp.bfloat16))

        @jax.jit
        def fn(carry):
            x, acc = carry
            y = conv3x3_pallas(x, k0, variant="cat9")
            acc = acc + jnp.sum(y[..., 0].astype(jnp.float32))
            x = x + (acc % 2).astype(x.dtype) * 1e-6
            return (x, acc), acc

        return timed_ms(fn, (x0, jnp.float32(0))) / B

    for cin, cout in ((64, 64), (64, 32), (192, 64)):
        flop = 2 * 9 * cin * cout * H * W / 1e9  # GFLOP/frame
        r = {"gflop_per_frame": round(flop, 1)}
        r["xla_ms"] = round(xla_case(cin, cout), 2)
        try:
            r["cat9_ms"] = round(cat9_case(cin, cout), 2)
        except Exception as e:
            r["cat9_ms"] = f"err {type(e).__name__}"
        for bh in (4, 8, 12):
            if H % bh:
                continue
            try:
                r[f"cm_bh{bh}_ms"] = round(cm_case(cin, cout, bh), 2)
            except Exception as e:
                r[f"cm_bh{bh}_ms"] = f"err {type(e).__name__}: {e}"[:80]
        best = min(v for k, v in r.items()
                   if k.endswith("_ms") and isinstance(v, float))
        r["best_pct_bf16_peak"] = round(100 * flop / 197e3 * 1000 / best, 1)
        results[f"{cin}->{cout}"] = r
        print(json.dumps({f"{cin}->{cout}": r}), flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
