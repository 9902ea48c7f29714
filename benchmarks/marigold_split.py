"""cfg5 sub-attribution (VERDICT r3 item 7): where do Marigold's 2.75 s/img
go, and what is the MXU utilization?

Legs (product geometry: FULL SD2 UNet, 768^2 input / 96^2 latents, bf16,
4 steps, ensemble 5 folded into the batch axis):
  - vae_encode   [1, 768, 768, 3] -> [1, 96, 96, 4]
  - unet_step    one forward at [5, 96, 96, 8] (the per-step cost; x4 steps)
  - vae_decode   [5, 96, 96, 4] -> [5, 768, 768, 3]
  - full         the production run_ensemble (cross-check vs cfg5)

FLOPs come from XLA's own cost model (compiled.cost_analysis()['flops'])
so the MXU-utilization figure is exact for the graph as compiled, not an
analytic estimate. Levers probed: decode chunking (5 members at once vs
1-at-a-time loop — HBM pressure vs launch count) and f32 vs bf16 VAE
decode (the reference runs the whole pipe fp16, render_depth.py:771).

Run: nohup python benchmarks/marigold_split.py > /tmp/marigold_split.json &
"""

from __future__ import annotations
# allow `python benchmarks/<script>.py` from anywhere
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import numpy as np

BF16_PEAK = 197e12  # v5e MXU bf16 FLOP/s


def _bf16(tree):
    import jax
    import jax.numpy as jnp

    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)


def timed_ms(fn, state, iters=6):
    state, cs = fn(state)
    float(np.asarray(cs).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        state, cs = fn(state)
    float(np.asarray(cs).sum())
    return (time.perf_counter() - t0) / iters * 1000.0


def flops_of(jitted, *args):
    """XLA cost-model FLOPs of a compiled callable (None if unavailable)."""
    try:
        c = jitted.lower(*args).compile()
        ca = c.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/vd3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from visiondepth3d_tpu.depth.diffusion.unet2d import (UNet2DCondition,
                                                          UNet2DConfig)
    from visiondepth3d_tpu.depth.diffusion.vae import AutoencoderKL, VAEConfig
    from visiondepth3d_tpu.depth.model import init_random_model_args
    from visiondepth3d_tpu.depth.diffusion.schedulers import DDIMSchedule

    ucfg, vcfg = UNet2DConfig(), VAEConfig()
    unet, vae = UNet2DCondition(ucfg), AutoencoderKL(vcfg)
    up = _bf16(init_random_model_args(
        unet, ((1, 16, 16, ucfg.in_channels),
               jax.ShapeDtypeStruct((), jnp.float32),
               (1, 77, ucfg.cross_attention_dim))))
    vp = _bf16(init_random_model_args(vae, ((1, 64, 64, 3),)))
    up = jax.device_put(up)
    vp = jax.device_put(vp)
    sched = DDIMSchedule(num_inference_steps=4)

    E, H, W = 5, 768, 768
    h8, w8 = H // 8, W // 8
    rng = np.random.default_rng(0)
    out = {}

    # ---- vae encode (batch 1: the ensemble encodes ONCE) ----
    @jax.jit
    def enc(vp_, carry):
        x, acc = carry
        lat = vae.apply({"params": vp_}, x * 2.0 - 1.0,
                        method=AutoencoderKL.encode_mode)
        acc = acc + jnp.sum(lat.astype(jnp.float32))
        return (x + (acc % 2).astype(x.dtype) * 1e-6, acc), acc

    x0 = jax.device_put(rng.random((1, H, W, 3), np.float32))
    out["vae_encode_ms"] = round(
        timed_ms(lambda c: enc(vp, c), (x0, jnp.float32(0))), 1)
    f = flops_of(enc, vp, (x0, jnp.float32(0)))
    if f:
        out["vae_encode_mxu_pct"] = round(
            100 * f / (out["vae_encode_ms"] / 1e3) / BF16_PEAK, 1)

    # ---- one unet step at the folded-ensemble batch ----
    ctx = jnp.zeros((E, 77, ucfg.cross_attention_dim), jnp.bfloat16)

    @jax.jit
    def step(up_, carry):
        lat, acc = carry
        inp = jnp.concatenate([lat, lat], axis=-1).astype(jnp.bfloat16)
        v = unet.apply({"params": up_}, inp, jnp.asarray(500.0), ctx)
        acc = acc + jnp.sum(v.astype(jnp.float32))
        return (lat + (acc % 2).astype(lat.dtype) * 1e-6, acc), acc

    lat0 = jax.device_put(rng.standard_normal((E, h8, w8, 4),
                                              ).astype(np.float32))
    out["unet_step_ms"] = round(
        timed_ms(lambda c: step(up, c), (lat0, jnp.float32(0))), 1)
    f = flops_of(step, up, (lat0, jnp.float32(0)))
    if f:
        out["unet_step_tflop"] = round(f / 1e12, 2)
        out["unet_step_mxu_pct"] = round(
            100 * f / (out["unet_step_ms"] / 1e3) / BF16_PEAK, 1)

    # ---- vae decode: all 5 members at once vs chunked ----
    @jax.jit
    def dec(vp_, carry):
        z, acc = carry
        d = vae.apply({"params": vp_}, z, method=AutoencoderKL.decode)
        acc = acc + jnp.sum(d.astype(jnp.float32))
        return (z + (acc % 2).astype(z.dtype) * 1e-6, acc), acc

    out["vae_decode5_ms"] = round(
        timed_ms(lambda c: dec(vp, c), (lat0, jnp.float32(0))), 1)
    f = flops_of(dec, vp, (lat0, jnp.float32(0)))
    if f:
        out["vae_decode5_mxu_pct"] = round(
            100 * f / (out["vae_decode5_ms"] / 1e3) / BF16_PEAK, 1)

    lat1 = lat0[:1]
    out["vae_decode1_ms"] = round(
        timed_ms(lambda c: dec(vp, c), (lat1, jnp.float32(0))), 1)

    # ---- f32 VAE decode (precision lever, downward-only check) ----
    vp32 = jax.device_put(jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x, vp))
    out["vae_decode5_f32_ms"] = round(
        timed_ms(lambda c: dec(vp32, c), (lat0, jnp.float32(0))), 1)

    # ---- ledger ----
    per_img = (out["vae_encode_ms"] + 4 * out["unet_step_ms"]
               + out["vae_decode5_ms"])
    out["sum_per_img_ms"] = round(per_img, 1)
    out["sum_imgs_per_s"] = round(1000.0 / per_img, 3)
    print(json.dumps({"metric": "cfg5 Marigold attribution", **out},
                     indent=1), flush=True)


if __name__ == "__main__":
    main()
