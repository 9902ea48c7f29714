"""cfg6 DepthCrafter denoise split: where do the 1546 ms/window go?

After the r5 flash fix (4377 -> 1546 ms/window) this probe attributes the
remaining time across the ST-UNet's block types at product geometry
(window 24 @ 1024x576 -> [24, 72, 128, C] activations, bf16, inner-loop
amortized launches):

  st_resnet_LX   — SpatialResnet + TemporalResnet + alpha blend
  st_attn_LX     — STTransformer (spatial 9216-tok attn + temporal 24-tok
                   attn + CLIP cross-attn + GEGLU FF)
  temporal_only  — the temporal TransformerLayer alone at [9216, 24, C]
                   (tiny-N, huge-batch: the shape class XLA's fused
                   attention handles without flash)

Run: nohup python benchmarks/st_unet_split.py > /tmp/st_split.out 2>&1 &
"""

from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vd3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from visiondepth3d_tpu.depth.diffusion.unet_st import (
        STResnet,
        STTransformer,
        TransformerLayer,
        UNetSTConfig,
    )

    cfg = UNetSTConfig()
    T = 24
    rng = np.random.default_rng(0)
    temb = jnp.asarray(rng.standard_normal((T, 1280)), jnp.bfloat16)
    ctx = jnp.zeros((T, 1, cfg.cross_attention_dim), jnp.bfloat16)

    def timed(label, mod, args, static=(), inner=4, iters=3):
        specs = tuple(jax.ShapeDtypeStruct(a.shape, a.dtype)
                      if a is not None else None for a in args)
        # host-side init with the static ints bound OUTSIDE eval_shape
        # (traced ints would flow into reshape shapes)
        shapes = jax.eval_shape(
            lambda rng, *a: mod.init(rng, *a, *static),
            jax.random.PRNGKey(0), *specs)["params"]
        host_rng = np.random.default_rng(0)
        params = jax.tree.map(
            lambda s: host_rng.normal(
                0.0, max(s.shape[0] if s.ndim >= 2 else s.size, 1) ** -0.5,
                s.shape).astype(np.float32),
            shapes)
        params = jax.device_put(jax.tree.map(
            lambda p: jnp.asarray(p, jnp.bfloat16), params))

        @jax.jit
        def run(acc0, params, *a):
            def body(_, acc):
                xin = a[0] + acc.astype(a[0].dtype) * 1e-30
                y = mod.apply({"params": params}, xin, *a[1:], *static)
                return acc + jnp.sum(y.astype(jnp.float32)) * 1e-30

            return lax.fori_loop(0, inner, body, acc0)

        acc = run(jnp.float32(0), params, *args)
        _ = float(acc)
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = run(acc, params, *args)
        _ = float(acc)
        ms = (time.perf_counter() - t0) / (iters * inner) * 1000
        print(json.dumps({"piece": label, "ms": round(ms, 2)}), flush=True)
        return ms

    # per-level shapes at 72x128 latents (block_out 320/640/1280/1280)
    levels = [(72, 128, 320, 5), (36, 64, 640, 10), (18, 32, 1280, 20),
              (9, 16, 1280, 20)]
    ledger = 0.0
    for li, (h, w, c, heads) in enumerate(levels):
        x = jnp.asarray(rng.standard_normal((T, h, w, c)), jnp.bfloat16)
        r = timed(f"st_resnet_L{li}_{h}x{w}x{c}",
                  STResnet(c, cfg.norm_groups), (x, temb), static=(T,))
        n_res = 2 + 3 + (2 if li == 3 else 0)
        ledger += n_res * r
        if li < 3:  # attn levels 0-2 + mid handled under L3 resnets' count
            a = timed(f"st_attn_L{li}_{h * w}tok_{c}",
                      STTransformer(heads, c // heads, cfg.norm_groups),
                      (x, ctx), static=(T,))
            ledger += 5 * a
    # mid attention at L3 geometry
    h, w, c, heads = levels[3]
    x = jnp.asarray(rng.standard_normal((T, h, w, c)), jnp.bfloat16)
    a = timed("st_attn_mid_144tok_1280",
              STTransformer(heads, c // heads, cfg.norm_groups),
              (x, ctx), static=(T,))
    ledger += a

    # temporal attention alone at the L0 shape
    z = jnp.asarray(rng.standard_normal((72 * 128, T, 320)), jnp.bfloat16)
    timed("temporal_layer_L0_[9216,24,320]",
          TransformerLayer(5, 64), (z, None))

    print(json.dumps({"sum_blocks_ms": round(ledger, 1),
                      "measured_per_step_ms": 773.2,
                      "note": "denoise 1546.4 ms/window / 2 steps"}),
          flush=True)


if __name__ == "__main__":
    main()
