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


def config5():
    """Marigold-architecture diffusion depth (4 steps), bf16 UNet."""
    import time as _t

    import jax

    from visiondepth3d_tpu.depth.diffusion.marigold import tiny_marigold

    # full-size Marigold weights aren't mountable offline; measure the
    # pipeline machinery with the tiny config at SD latent geometry
    pipe = tiny_marigold(steps=4)
    rng = np.random.default_rng(0)
    rgb = rng.random((4, 256, 256, 3), dtype=np.float32)
    # distinct seed per launch -> distinct noise arg (no relay dedup);
    # float(sum) is the readback fence (block_until_ready is unreliable
    # through the relay)
    d = pipe(rgb, seed=999)
    float(np.asarray(d).sum())
    t0 = _t.perf_counter()
    iters = 5
    for i in range(iters):
        d = pipe(rgb, seed=i)
        float(np.asarray(d).sum())
    dt = _t.perf_counter() - t0
    return {"metric": "cfg5 marigold-pipeline (tiny arch, 4 steps) imgs/s",
            "value": round(4 * iters / dt, 2), "unit": "img/s"}


CONFIGS = {1: config1, 3: config3, 4: config4, 5: config5}


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
