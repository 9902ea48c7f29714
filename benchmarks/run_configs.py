"""Benchmark harness for the five BASELINE.json configs.

Run: ``python benchmarks/run_configs.py [--configs 1,2,...] [--iters N]``
Prints one JSON line per config. The headline driver metric stays in
/root/repo/bench.py (config 2); this harness covers the rest:

1. small depth model (256 px) + basic Half-SBS warp, 640x360
2. DA-V2-S @ 518 + full Pop-Control/feather/heal @ 1080p  (== bench.py)
3. DPT-BEiT-Large + EMA subject tracking, floating window, DOF (4K VR)
4. RIFE 2x + Real-ESRGAN x4 fused with the stereo pipeline (1080p -> 4K)
5. Marigold-architecture diffusion depth (fp16/bf16), 16-bit export path

Measurement model matches bench.py: device-resident inputs, fori_loop of
chunks per launch, checksum-forced outputs (axon-relay artifacts excluded),
and — critically — every LAUNCH's arguments depend on the previous launch's
result (the carried state). The axon relay dedups repeated identical
(program, args) executions (observed as near-0 ms repeats,
benchmarks/depth_split.py), so launching the same args in a timing loop
measures the relay cache, not the chip. The original r2 harness had this
flaw; numbers before the fix are struck in RESULTS.md.
"""


from __future__ import annotations
# allow `python benchmarks/<script>.py` from anywhere
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def _timed_fps(pipeline, state, rest, frames_per_launch: int,
               iters: int) -> float:
    """pipeline(state, *rest) -> (state, checksum); the carried state makes
    each launch's args unique (see module docstring)."""
    state, checksum = pipeline(state, *rest)
    _ = int(checksum)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, checksum = pipeline(state, *rest)
    _ = int(checksum)
    dt = time.perf_counter() - t0
    return frames_per_launch * iters / dt


def config1():
    """Small depth (256px, ViT-S arch) + basic Half-SBS warp @ 640x360."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from visiondepth3d_tpu.depth import DA_V2_SMALL, DepthPredictor, init_random
    from visiondepth3d_tpu.state import init_trackers
    from visiondepth3d_tpu.stereo import StereoParams
    from visiondepth3d_tpu.stereo.step import render_chunk

    T, K, H, W = 16, 16, 360, 640
    pred = DepthPredictor(DA_V2_SMALL, init_random(DA_V2_SMALL, size=252),
                          inference_size=252, dtype="bfloat16")
    params = StereoParams(
        enable_feathering=False, enable_edge_masking=False,
        enable_healing=False, use_subject_tracking=False,
        enable_floating_window=False, enable_dynamic_parallax=False,
    ).with_shift_bound(W)
    tr = init_trackers(H, W)

    @jax.jit
    def pipe(carry, mp, fu8):
        def chunk(_, carry):
            t, acc = carry
            # chain on the carry: loop-invariant inputs let XLA hoist the
            # whole depth stage out of the K-loop (the bench.py r2 bug)
            f = (fu8 + (acc % 2).astype(jnp.uint8)).astype(jnp.float32) / 255.0
            d = pred.predict_01(f, out_hw=(H, W))
            t, outs = render_chunk(params, t, f, d)
            half = jnp.concatenate(
                [outs.left[:, :, ::2], outs.right[:, :, ::2]], axis=2
            )
            u8 = (jnp.clip(half * 255 + 0.5, 0, 255)).astype(jnp.uint8)
            return t, acc + jnp.sum(u8.astype(jnp.int32))

        carry = lax.fori_loop(0, K, chunk, carry)
        return carry, carry[1]

    frames = jax.device_put(
        (np.random.default_rng(0).random((T, H, W, 3)) * 255).astype(np.uint8)
    )
    fps = _timed_fps(lambda s, *a: pipe(s, *a), (tr, jnp.int32(0)),
                     (pred.params, frames), K * T, 3)
    return {"metric": "cfg1 360p small-depth + basic Half-SBS fps/chip",
            "value": round(fps, 2), "unit": "fps"}


def config3():
    """DPT-BEiT-Large-arch depth + full tracking + DOF, 4K VR export.

    Measurement: per-stage on-device loops (fori_loop with accumulator
    feedback), fps = 1000 / sum(stage ms/frame). The stages must be
    separate jits on this rig — the monolithic 4K BEiT graph (and even
    model+4K-resize in one jit) reproducibly crashed the axon remote
    compiler; a cross-jit Python loop would only measure the relay's ~2 s
    per-dispatch latency (measured 0.05 "fps" that way). Each stage alone
    is the honest per-chip cost; a production host overlaps them anyway.
    """
    import time as _t

    import jax
    import jax.numpy as jnp
    from jax import lax

    from visiondepth3d_tpu.depth.dpt_beit import DPT_BEIT_LARGE_512, DPTBEiT
    from visiondepth3d_tpu.depth.model import DepthPredictor, init_random_model
    from visiondepth3d_tpu.ops import formats as fmt_ops
    from visiondepth3d_tpu.ops.resize import resize_bilinear
    from visiondepth3d_tpu.state import init_trackers
    from visiondepth3d_tpu.stereo import StereoParams
    from visiondepth3d_tpu.stereo.step import render_chunk

    T, K, H, W = 2, 8, 2160, 3840
    model = DPTBEiT(DPT_BEIT_LARGE_512)
    s = 384
    # host-side init: the on-device BEiT-L init graph also killed the relay
    mp = init_random_model(model, (1, s, s, 3))
    pred = DepthPredictor(DPT_BEIT_LARGE_512, mp, inference_size=s,
                          dtype="bfloat16", model=model)
    # bf16 image plane (the production recommendation, same as bench.py):
    # at 4K it also buys the postfx kernel a 40-row block (f32 forces 8)
    params = StereoParams(dof_strength=2.0, dof_levels=3,
                          enable_healing=True, image_dtype="bfloat16"
                          ).with_shift_bound(W)
    tr = init_trackers(H, W)

    @jax.jit
    def down_loop(c, fu8):
        def it(_, acc):
            f = (fu8.astype(jnp.float32) + acc * 1e-30) / 255.0
            fs = resize_bilinear(f, (s, s), channel_last=True)
            return acc + jnp.sum(fs) * 1e-30
        return lax.fori_loop(0, K, it, c)

    @jax.jit
    def model_loop(c, mp, fs):
        def it(_, acc):
            d = pred._forward(mp, fs + acc * 1e-30)
            return acc + jnp.sum(d) * 1e-30
        return lax.fori_loop(0, K, it, c)

    @jax.jit
    def up_loop(c, d):
        def it(_, acc):
            dd = d + acc * 1e-30
            lo = jnp.min(dd, axis=(1, 2), keepdims=True)
            hi = jnp.max(dd, axis=(1, 2), keepdims=True)
            d01 = (dd - lo) / jnp.maximum(hi - lo, 1e-6)
            d4k = resize_bilinear(d01, (H, W), channel_last=False)
            return acc + jnp.sum(d4k) * 1e-30
        return lax.fori_loop(0, K, it, c)

    @jax.jit
    def stereo_loop(c, f, d):
        def chunk(_, carry):
            t, acc = carry
            t, outs = render_chunk(params, t, f + acc * 1e-30, d)
            vr = jax.vmap(
                lambda L, R: fmt_ops.format_3d_output(L, R, "VR")
            )(outs.left, outs.right)
            u8 = (jnp.clip(vr * 255 + 0.5, 0, 255)).astype(jnp.uint8)
            return t, acc + jnp.sum(u8.astype(jnp.float32)) * 1e-30
        return lax.fori_loop(0, K, chunk, c)

    rng = np.random.default_rng(0)
    frames = jax.device_put((rng.random((T, H, W, 3)) * 255).astype(np.uint8))
    f4k = jax.device_put(rng.random((T, H, W, 3), np.float32))
    fs = jax.device_put(rng.random((T, s, s, 3), np.float32))
    d_model = jax.device_put(rng.random((T, s, s), np.float32))
    d4k = jax.device_put(rng.random((T, H, W), np.float32))

    import sys

    def scalar(out):
        # force a host readback: block_until_ready is unreliable for
        # timing through the axon relay (verify-skill TPU discipline)
        leaves = jax.tree.leaves(out)
        return float(jnp.asarray(leaves[-1]).sum())

    def stage(name, fn, carry, args):
        # carry chains LAUNCHES: identical (program, args) repeats dedup
        # in the relay (module docstring) and read as ~0 ms
        carry = fn(carry, *args)
        scalar(carry)
        print(f"cfg3: {name} compiled", file=sys.stderr, flush=True)
        t0 = _t.perf_counter()
        iters = 3
        for _ in range(iters):
            carry = fn(carry, *args)
        scalar(carry)
        return (_t.perf_counter() - t0) / (iters * K * T) * 1e3

    ms = {
        "down": stage("down", down_loop, jnp.float32(0), (frames,)),
        "model": stage("model", model_loop, jnp.float32(0),
                       (pred.params, fs)),
        "up": stage("up", up_loop, jnp.float32(0), (d_model,)),
        "stereo": stage("stereo", stereo_loop, (tr, jnp.float32(0)),
                        (f4k, d4k)),
    }
    total = sum(ms.values())
    return {"metric": "cfg3 4K VR BEiT-L depth + tracking + DOF fps/chip",
            "value": round(1000.0 / total, 2), "unit": "fps",
            "stages_ms": {k: round(v, 2) for k, v in ms.items()}}


def config4():
    """RIFE 2x + ESRGAN x4 (1080p -> 4K) fused enhance pipeline."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from visiondepth3d_tpu.enhance import EnhanceConfig, init_enhance_params
    from visiondepth3d_tpu.enhance.esrgan import RRDBNet
    from visiondepth3d_tpu.enhance.rife import IFNet

    T, K, H, W = 2, 4, 1080, 1920
    import jax as _jax

    cfg = EnhanceConfig(esrgan_nb=6)  # nb=6 keeps the bench model HBM-sized
    ep, rp = init_enhance_params(cfg)
    # bf16 conv stacks (EnhanceConfig.dtype="bfloat16" production mode)
    ep = _jax.device_put(_jax.tree.map(lambda p: p.astype(jnp.bfloat16), ep))
    rp = _jax.device_put(_jax.tree.map(lambda p: p.astype(jnp.bfloat16), rp))
    esrgan = RRDBNet(cfg.esrgan_nf, cfg.esrgan_nb, scale=4)
    rife = IFNet(scales=cfg.rife_scales)

    @jax.jit
    def pipe(acc0, ep, rp, fu8):
        def chunk(_, acc):
            # carry-chained input (see config1 hoisting note)
            x = (fu8 + (acc % 2).astype(jnp.uint8)).astype(jnp.bfloat16) / jnp.bfloat16(255.0)
            # staged execution (enhance/esrgan.py): RRDB trunk whole-frame
            # at 1080p (Pallas small-channel convs), x4 tail tiled 2x4 so
            # the 4K activations never exist whole (whole-graph measured
            # 32.7 GB vs 15.75 HBM, benchmarks/esrgan_split.py)
            from visiondepth3d_tpu.enhance.esrgan import apply_rrdbnet_staged

            u = apply_rrdbnet_staged(esrgan, ep, x,
                                     tail_tile_hw=(270, 480), halo=2)
            u8 = (jnp.clip(u * 255 + 0.5, 0, 255)).astype(jnp.uint8)
            up_sum = jnp.sum(u8.astype(jnp.int32))
            mid = rife.apply({"params": rp}, x[:-1], x[1:], 0.5)
            m8 = (jnp.clip(mid * 255 + 0.5, 0, 255)).astype(jnp.uint8)
            return acc + up_sum + jnp.sum(m8.astype(jnp.int32))

        acc = lax.fori_loop(0, K, chunk, acc0)
        return acc, acc

    frames = jax.device_put(
        (np.random.default_rng(0).random((T, H, W, 3)) * 255).astype(np.uint8)
    )
    fps = _timed_fps(lambda s, *a: pipe(s, *a), jnp.int32(0),
                     (ep, rp, frames), K * T, 2)
    return {"metric": "cfg4 RIFE 2x + ESRGAN x4 1080p->4K fps/chip",
            "value": round(fps, 2), "unit": "fps"}


def _bf16(tree):
    import jax.numpy as jnp

    return __import__("jax").tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == np.float32 else x, tree)


def config5():
    """Marigold at PRODUCT geometry (VERDICT r2 item 2): the FULL SD2
    UNet (320/640/1280/1280, 8ch-in) + full SD VAE, bf16, 768x768 input
    (96x96 latents — flash attention over the 9216 tokens), 4 denoise
    steps, ensemble 5 with median reduction — the reference pipeline's
    exact defaults (render_depth.py:771-793, num_inference_steps=4,
    ensemble_size=5). Weights are host-random (no egress); the graph is
    FLOP-identical to real Marigold.

    Measurement: the ensemble is folded into the batch axis (one launch
    denoises all 5 members — the TPU-native formulation; the reference
    loops members serially on CUDA) and the whole encode+denoise+decode
    runs as ONE jit per image with seed-distinct noise per launch."""
    import time as _t

    import jax
    import jax.numpy as jnp

    from visiondepth3d_tpu.depth.diffusion.marigold import MarigoldPipeline
    from visiondepth3d_tpu.depth.diffusion.unet2d import UNet2DConfig
    from visiondepth3d_tpu.depth.diffusion.vae import VAEConfig
    from visiondepth3d_tpu.depth.model import init_random_model_args
    from visiondepth3d_tpu.depth.diffusion.unet2d import UNet2DCondition
    from visiondepth3d_tpu.depth.diffusion.vae import AutoencoderKL

    ucfg, vcfg = UNet2DConfig(), VAEConfig()
    unet, vae = UNet2DCondition(ucfg), AutoencoderKL(vcfg)
    up = init_random_model_args(
        unet, ((1, 16, 16, ucfg.in_channels),
               jax.ShapeDtypeStruct((), jnp.float32),
               (1, 77, ucfg.cross_attention_dim)))
    vp = init_random_model_args(vae, ((1, 64, 64, 3),))
    n_params = sum(x.size for x in jax.tree.leaves(up))
    pipe = MarigoldPipeline(
        ucfg, vcfg, _bf16(up), _bf16(vp),
        np.zeros((1, 77, ucfg.cross_attention_dim), np.float32),
        num_steps=4, ensemble_size=5)

    rng = np.random.default_rng(0)
    rgb = rng.random((1, 768, 768, 3), dtype=np.float32)

    d = pipe.run_ensemble(rgb, seed=999)
    float(np.asarray(d).sum())  # fence (compile + first run)
    iters = 4
    t0 = _t.perf_counter()
    for i in range(iters):
        d = pipe.run_ensemble(rgb, seed=i)  # distinct noise per launch
        float(np.asarray(d).sum())
    dt = _t.perf_counter() - t0
    return {"metric": "cfg5 Marigold FULL SD2 UNet 768^2, 4 steps, "
                      "ensemble 5 (product geometry) imgs/s",
            "value": round(iters / dt, 3), "unit": "img/s",
            "unet_params_millions": round(n_params / 1e6, 1)}


def config6():
    """DepthCrafter at PRODUCT scale (VERDICT r2 item 2): full SVD-class
    ST-UNet (320/640/1280/1280 spatial+temporal sublayers) + full SD VAE,
    bf16, window 24 @ 1024x576 (DC-Max defaults: render_depth.py:1781,
    INFERENCE_RESOLUTIONS :671-675), 2 denoise steps, overlap 6.

    Measurement: per-stage on-device fori loops summed (cfg3 convention —
    the monolithic graph risks the axon remote-compiler; production
    overlaps stages anyway): VAE encode/frame + window denoise (2 steps,
    [1,24,72,128,8]) amortized over the 18 NEW frames a window yields at
    overlap 6 + chunked VAE decode/frame."""
    import time as _t

    import jax
    import jax.numpy as jnp
    from jax import lax

    from visiondepth3d_tpu.depth.diffusion.unet_st import (
        UNetSpatioTemporal,
        UNetSTConfig,
    )
    from visiondepth3d_tpu.depth.diffusion.vae import AutoencoderKL, VAEConfig
    from visiondepth3d_tpu.depth.diffusion.schedulers import (
        EulerSchedule,
        svd_precondition,
    )
    from visiondepth3d_tpu.depth.model import init_random_model_args

    H, W = 576, 1024
    h8, w8 = H // 8, W // 8
    TW, OV, STEPS = 24, 6, 2
    ucfg, vcfg = UNetSTConfig(), VAEConfig()
    unet, vae = UNetSpatioTemporal(ucfg), AutoencoderKL(vcfg)
    up = _bf16(init_random_model_args(
        unet, ((1, 2, 16, 16, ucfg.in_channels),
               jax.ShapeDtypeStruct((), jnp.float32),
               (1, 1, ucfg.cross_attention_dim))))
    vp = _bf16(init_random_model_args(vae, ((1, 64, 64, 3),)))
    n_params = sum(x.size for x in jax.tree.leaves(up))
    up = jax.device_put(up)
    vp = jax.device_put(vp)
    sched = EulerSchedule(num_inference_steps=STEPS)
    ctx = jax.device_put(np.zeros((1, 1, ucfg.cross_attention_dim),
                                  np.float32))

    def ms_per_iter(fn, state, iters=3):
        state, cs = fn(state)
        float(np.asarray(cs).sum())
        t0 = _t.perf_counter()
        for _ in range(iters):
            state, cs = fn(state)
        float(np.asarray(cs).sum())
        return (_t.perf_counter() - t0) / iters * 1000.0

    rng = np.random.default_rng(0)

    # --- encode leg: [4, H, W, 3] per launch, chained on the carry ---
    enc_b = 4
    frames0 = jax.device_put(rng.random((enc_b, H, W, 3), np.float32))

    # params are explicit jit ARGUMENTS, not closure captures: captured
    # device arrays are baked into the lowering as constants (2.25 GB for
    # the ST-UNet), which stalls the compiler. Wrapping keeps ms_per_iter's
    # fn(state) calling convention.
    @jax.jit
    def enc_jit(vp_, carry):
        x, acc = carry
        # production casts activations to the weight dtype
        # (DepthCrafterPipeline._encode); without it the f32 input
        # promotes every conv to f32 on the MXU
        lat = vae.apply({"params": vp_},
                        x.astype(jnp.bfloat16) * 2.0 - 1.0,
                        method=AutoencoderKL.encode_mode)
        acc = acc + jnp.sum(lat.astype(jnp.float32))
        x = x + (acc % 2).astype(x.dtype) * 1e-6  # chain input on carry
        return (x, acc), acc

    def enc_fn(carry):
        return enc_jit(vp, carry)

    print(json.dumps({'cfg6_leg': 'enc start'}), flush=True)
    enc_ms = ms_per_iter(enc_fn, (frames0, jnp.float32(0))) / enc_b
    print(json.dumps({'cfg6_leg': 'enc', 'ms_per_frame': round(enc_ms, 1)}), flush=True)

    # --- denoise leg: one window, 2 steps, one launch ---
    cond0 = jax.device_put(
        rng.standard_normal((1, TW, h8, w8, 4)).astype(np.float32))
    sigma0 = float(sched.sigmas[0])

    @jax.jit
    def den_jit(up_, carry):
        cond, acc = carry
        noise = cond[..., ::-1] * 0.7 + acc % 3  # cheap chained "noise"
        latent = noise * sigma0
        for i in range(STEPS):
            sigma = float(sched.sigmas[i])
            c_skip, c_out, c_in = svd_precondition(sigma)
            inp = jnp.concatenate([latent * c_in, cond], axis=-1)
            t = jnp.asarray(0.25 * np.log(sigma), jnp.float32)
            f = unet.apply({"params": up_}, inp.astype(jnp.bfloat16), t, ctx)
            latent = sched.step(c_skip * latent + c_out
                                * f.astype(jnp.float32), i, latent)
        acc = acc + jnp.sum(latent)
        cond = cond + (acc % 2) * 1e-6
        return (cond, acc), acc

    def den_fn(carry):
        return den_jit(up, carry)

    print(json.dumps({'cfg6_leg': 'denoise start'}), flush=True)
    den_ms = ms_per_iter(den_fn, (cond0, jnp.float32(0)), iters=3)
    print(json.dumps({'cfg6_leg': 'denoise', 'ms_per_window': round(den_ms, 1)}), flush=True)

    # --- decode leg: [4, h8, w8, 4] latents per launch ---
    lat0 = jax.device_put(
        rng.standard_normal((enc_b, h8, w8, 4)).astype(np.float32))

    @jax.jit
    def dec_jit(vp_, carry):
        z, acc = carry
        # production decodes frames chunk-1 via lax.map at the weight
        # dtype (DepthCrafterPipeline._decode, marigold_split decode5-vs-
        # decode1 finding); mirror it
        d = jax.lax.map(
            lambda zi: vae.apply({"params": vp_},
                                 zi[None].astype(jnp.bfloat16),
                                 method=AutoencoderKL.decode)[0], z)
        acc = acc + jnp.sum(d.astype(jnp.float32))
        z = z + (acc % 2).astype(z.dtype) * 1e-6
        return (z, acc), acc

    def dec_fn(carry):
        return dec_jit(vp, carry)

    dec_ms = ms_per_iter(dec_fn, (lat0, jnp.float32(0))) / enc_b

    new_frames = TW - OV  # frames a window advances the clip by
    ms_frame = enc_ms + den_ms / new_frames + dec_ms
    return {"metric": "cfg6 DepthCrafter FULL SVD ST-UNet, window 24 @ "
                      "1024x576, 2 steps (product geometry) fps/chip",
            "value": round(1000.0 / ms_frame, 2), "unit": "fps",
            "stages_ms": {"vae_encode_per_frame": round(enc_ms, 1),
                          "denoise_per_window": round(den_ms, 1),
                          "vae_decode_per_frame": round(dec_ms, 1)},
            "unet_params_millions": round(n_params / 1e6, 1)}


CONFIGS = {1: config1, 3: config3, 4: config4, 5: config5, 6: config6}


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vd3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1,3,4,5")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    for c in [int(x) for x in args.configs.split(",")]:
        try:
            print(json.dumps(CONFIGS[c]()), flush=True)
        except Exception as e:
            print(json.dumps({"metric": f"cfg{c}", "error": f"{type(e).__name__}: {e}"}),
                  flush=True)


if __name__ == "__main__":
    main()
