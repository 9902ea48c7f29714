"""EXACT space-to-depth reformulation of small-channel 3x3 convs
(VERDICT r4 #7 — one more structural probe for the DPT head).

The head's convs run at [32,148,148,64->64] / [32,296,296,64->32] where
C=64 fills only half the MXU's 128 contraction lanes (recorded ceiling
~35-60% MXU; Pallas cat9, int8 and channel-pad all negative at these
shapes). This probe reformulates the SAME conv exactly:

  space-to-depth by 2 -> phase tensors; a 3x3 stride-1 conv decomposes
  into 9 BLOCK-SHIFT matmuls over the s2d grid:
    center  [4C, 4O]  (16/36 of the MACs at 256-lane contraction)
    4 edges [2C, 2O]  (4/36 each)
    4 corners [C, O]  (1/36 each)
  summed into the s2d output and depth-to-space'd back. Zero extra FLOPs,
  bit-exact up to dot-product reassociation.

Variants timed at head shapes (bf16, B=32):
  xla_conv   — nn.Conv baseline (what ships)
  s2d_exact  — the decomposition above (parity-checked vs lax.conv)
  s2d_dense9 — all 9 shifts as dense [4C,4O] (4x FLOPs, all full-lane;
               sanity point for whether lane fill or FLOPs dominate)

Run: nohup python benchmarks/s2d_conv_probe.py > /tmp/s2d_conv.out 2>&1 &
"""

from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import numpy as np

B = 32


def build_shift_weights(k: np.ndarray, dense: bool):
    """k: [3, 3, C, O] -> {(by, bx): (in_phases, out_phases, W)}.

    Phase order in concatenation is (py, px)-major: index p = py*2+px.
    W[(pi)*C + c, (po)*O + o] = k[dy, dx, c, o] where
    dy = 2*by + py - qy + 1 (valid in 0..2), same for x.
    """
    C, O = k.shape[2], k.shape[3]
    out = {}
    for by in (-1, 0, 1):
        for bx in (-1, 0, 1):
            entries = []
            in_ph, out_ph = set(), set()
            for py in (0, 1):
                for qy in (0, 1):
                    dy = 2 * by + py - qy + 1
                    if not 0 <= dy <= 2:
                        continue
                    for px in (0, 1):
                        for qx in (0, 1):
                            dx = 2 * bx + px - qx + 1
                            if not 0 <= dx <= 2:
                                continue
                            entries.append((py, px, qy, qx, dy, dx))
                            in_ph.add((py, px))
                            out_ph.add((qy, qx))
            if dense:
                in_ph = {(a, b) for a in (0, 1) for b in (0, 1)}
                out_ph = in_ph
            in_list = sorted(in_ph)
            out_list = sorted(out_ph)
            w = np.zeros((len(in_list) * C, len(out_list) * O), k.dtype)
            for py, px, qy, qx, dy, dx in entries:
                i0 = in_list.index((py, px)) * C
                o0 = out_list.index((qy, qx)) * O
                w[i0:i0 + C, o0:o0 + O] = k[dy, dx]
            out[(by, bx)] = (in_list, out_list, w)
    return out


def s2d_conv(x, shift_weights, C, O):
    """x: [B, H, W, C] -> exact 3x3 SAME conv via block-shift matmuls."""
    import jax.numpy as jnp

    b, h, w, _ = x.shape
    hh, ww = h // 2, w // 2
    # phase tensors [B, hh, ww, C], zero-padded by one block for shifts
    ph = {}
    for py in (0, 1):
        for px in (0, 1):
            t = x[:, py::2, px::2, :]
            ph[(py, px)] = jnp.pad(t, [(0, 0), (1, 1), (1, 1), (0, 0)])
    acc = {(qy, qx): 0.0 for qy in (0, 1) for qx in (0, 1)}
    for (by, bx), (in_list, out_list, wmat) in shift_weights.items():
        zin = jnp.concatenate(
            [ph[p][:, 1 + by : 1 + by + hh, 1 + bx : 1 + bx + ww, :]
             for p in in_list], axis=-1)
        y = zin @ wmat.astype(zin.dtype)  # [B, hh, ww, len(out)*O]
        for i, q in enumerate(out_list):
            acc[q] = acc[q] + y[..., i * O:(i + 1) * O]
    # depth-to-space: interleave the 4 output phases
    out = jnp.zeros((b, h, w, O), x.dtype)
    for (qy, qx), v in acc.items():
        out = out.at[:, qy::2, qx::2, :].set(v.astype(x.dtype))
    return out


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vd3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)

    # ---- parity check at a small shape (f32, vs lax.conv) ----
    C, O = 8, 8
    k = rng.standard_normal((3, 3, C, O)).astype(np.float32) * 0.1
    x = rng.standard_normal((2, 12, 16, C)).astype(np.float32)
    ref = lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    sw = build_shift_weights(k, dense=False)
    got = s2d_conv(jnp.asarray(x), sw, C, O)
    err = float(jnp.abs(got - ref).max())
    assert err < 1e-4, err
    sw_d = build_shift_weights(k, dense=True)
    got_d = s2d_conv(jnp.asarray(x), sw_d, C, O)
    err_d = float(jnp.abs(got_d - ref).max())
    assert err_d < 1e-4, err_d
    print(json.dumps({"parity": "exact", "err": err, "err_dense": err_d}),
          flush=True)

    # ---- timing at head shapes, bf16 ----
    def timed(label, fn, args, inner=8, iters=3):
        @jax.jit
        def run(acc0, *a):
            def body(_, acc):
                y = fn(acc, *a)
                return acc0 * 0 + jnp.sum(y.astype(jnp.float32)) * 1e-30 + acc

            return lax.fori_loop(0, inner, body, acc0)

        acc = run(jnp.float32(0), *args)
        _ = float(acc)
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = run(acc, *args)
        _ = float(acc)
        ms = (time.perf_counter() - t0) / (iters * inner) * 1000
        print(json.dumps({"variant": label, "ms": round(ms, 3),
                          "ms_per_frame": round(ms / B, 4)}), flush=True)

    from flax import linen as nn

    for h, cin, cout in [(148, 64, 64), (296, 64, 32)]:
        xb = jnp.asarray(rng.standard_normal((B, h, h, cin)), jnp.bfloat16)
        kb = (rng.standard_normal((3, 3, cin, cout)) * 0.05).astype(np.float32)

        conv = nn.Conv(cout, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=jnp.bfloat16, use_bias=False)
        p = {"kernel": jnp.asarray(kb, jnp.bfloat16)}

        def xla_body(acc, x, p=p, conv=conv):
            return conv.apply({"params": p},
                              x + acc.astype(jnp.bfloat16) * 1e-30)

        timed(f"xla_conv_{h}_{cin}to{cout}", xla_body, (xb,))

        swb = build_shift_weights(kb.astype(np.float32), dense=False)

        def s2d_body(acc, x, swb=swb, cin=cin, cout=cout):
            return s2d_conv(x + acc.astype(jnp.bfloat16) * 1e-30, swb,
                            cin, cout)

        timed(f"s2d_exact_{h}_{cin}to{cout}", s2d_body, (xb,))

        swd = build_shift_weights(kb.astype(np.float32), dense=True)

        def s2d_dense_body(acc, x, swd=swd, cin=cin, cout=cout):
            return s2d_conv(x + acc.astype(jnp.bfloat16) * 1e-30, swd,
                            cin, cout)

        timed(f"s2d_dense9_{h}_{cin}to{cout}", s2d_dense_body, (xb,))


if __name__ == "__main__":
    main()
