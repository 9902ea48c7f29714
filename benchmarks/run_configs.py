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
chunks per launch, checksum-forced outputs (axon-relay artifacts excluded).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _timed_fps(pipeline, args, frames_per_launch: int, iters: int) -> float:
    import jax

    state, checksum = pipeline(*args)
    _ = int(checksum)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, checksum = pipeline(*args)
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
    def pipe(mp, tr, fu8):
        def chunk(_, carry):
            t, acc = carry
            f = fu8.astype(jnp.float32) / 255.0
            d = pred.predict_01(f, out_hw=(H, W))
            t, outs = render_chunk(params, t, f, d)
            half = jnp.concatenate(
                [outs.left[:, :, ::2], outs.right[:, :, ::2]], axis=2
            )
            u8 = (jnp.clip(half * 255 + 0.5, 0, 255)).astype(jnp.uint8)
            return t, acc + jnp.sum(u8.astype(jnp.int32))

        tr2, acc = lax.fori_loop(0, K, chunk, (tr, jnp.int32(0)))
        return tr2, acc

    frames = jax.device_put(
        (np.random.default_rng(0).random((T, H, W, 3)) * 255).astype(np.uint8)
    )
    fps = _timed_fps(lambda *a: pipe(*a), (pred.params, tr, frames), K * T, 3)
    return {"metric": "cfg1 360p small-depth + basic Half-SBS fps/chip",
            "value": round(fps, 2), "unit": "fps"}


def config3():
    """DPT-BEiT-Large-arch depth + full tracking + DOF, 4K VR export."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from visiondepth3d_tpu.depth.dpt_beit import DPT_BEIT_LARGE_512, DPTBEiT
    from visiondepth3d_tpu.depth.model import DepthPredictor
    from visiondepth3d_tpu.ops import formats as fmt_ops
    from visiondepth3d_tpu.state import init_trackers
    from visiondepth3d_tpu.stereo import StereoParams
    from visiondepth3d_tpu.stereo.step import render_chunk

    # K=1: the 4K fori_loop graph at K=2 reproducibly broke the axon
    # remote-compile relay (broken pipe) — keep each jit small and log
    # per-stage compile progress
    T, K, H, W = 2, 1, 2160, 3840
    model = DPTBEiT(DPT_BEIT_LARGE_512)
    s = 384
    from visiondepth3d_tpu.depth.model import init_random_model

    # host-side init: the on-device BEiT-L init graph reproducibly killed
    # the axon remote-compile relay (broken pipe before the forward even
    # started compiling)
    mp = init_random_model(model, (1, s, s, 3))
    pred = DepthPredictor(DPT_BEIT_LARGE_512, mp, inference_size=s,
                          dtype="bfloat16", model=model)
    params = StereoParams(dof_strength=2.0, dof_levels=3,
                          enable_healing=True).with_shift_bound(W)
    tr = init_trackers(H, W)

    # the monolithic 4K BEiT-L graph reproducibly breaks the axon remote
    # compiler (broken pipe); split into two jits. Each launch still loops
    # K chunks internally to amortize dispatch.
    @jax.jit
    def depth_fn(mp, fu8):
        f = fu8.astype(jnp.float32) / 255.0
        return f, pred.predict_01(f, out_hw=(H, W))

    @jax.jit
    def stereo_fn(tr, f, d):
        def chunk(_, carry):
            t, acc = carry
            t, outs = render_chunk(params, t, f, d)
            vr = jax.vmap(
                lambda L, R: fmt_ops.format_3d_output(L, R, "VR")
            )(outs.left, outs.right)
            u8 = (jnp.clip(vr * 255 + 0.5, 0, 255)).astype(jnp.uint8)
            return t, acc + jnp.sum(u8.astype(jnp.int32))

        return lax.fori_loop(0, K, chunk, (tr, jnp.int32(0)))

    def pipe(mp, tr, fu8):
        f, d = depth_fn(mp, fu8)
        import sys

        if not getattr(pipe, "_logged", False):
            d.block_until_ready()
            print("cfg3: depth graph compiled", file=sys.stderr, flush=True)
            pipe._logged = True
        tr, acc = stereo_fn(tr, f, d)
        return tr, acc

    frames = jax.device_put(
        (np.random.default_rng(0).random((T, H, W, 3)) * 255).astype(np.uint8)
    )
    fps = _timed_fps(pipe, (mp, tr, frames), K * T, 3)
    return {"metric": "cfg3 4K VR BEiT-L depth + tracking + DOF fps/chip",
            "value": round(fps, 2), "unit": "fps"}


def config4():
    """RIFE 2x + ESRGAN x4 (1080p -> 4K) fused enhance pipeline."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from visiondepth3d_tpu.enhance import EnhanceConfig, init_enhance_params
    from visiondepth3d_tpu.enhance.esrgan import RRDBNet
    from visiondepth3d_tpu.enhance.rife import IFNet

    T, K, H, W = 2, 4, 1080, 1920
    cfg = EnhanceConfig(esrgan_nb=6)  # nb=6 keeps the bench model HBM-sized
    ep, rp = init_enhance_params(cfg)
    esrgan = RRDBNet(cfg.esrgan_nf, cfg.esrgan_nb, scale=4)
    rife = IFNet(scales=cfg.rife_scales)

    @jax.jit
    def pipe(ep, rp, fu8):
        def chunk(_, acc):
            x = fu8.astype(jnp.float32) / 255.0
            # 4K x4 activations blow HBM if run whole-frame (measured:
            # 15.9G program); tile spatially exactly like the reference's
            # ESRGAN tiler (merged_pipeline.py:269-284)
            from visiondepth3d_tpu.ops.tiling import extract_tiles

            def one(frame):
                tiles, _ = extract_tiles(frame, (360, 480), overlap=0)
                def up_tile(tile):
                    u = esrgan.apply({"params": ep}, tile[None])[0]
                    u8 = (jnp.clip(u * 255 + 0.5, 0, 255)).astype(jnp.uint8)
                    return jnp.sum(u8.astype(jnp.int32))
                return jnp.sum(lax.map(up_tile, tiles))

            up_sum = jnp.sum(lax.map(one, x))
            mid = rife.apply({"params": rp}, x[:-1], x[1:], 0.5)
            m8 = (jnp.clip(mid * 255 + 0.5, 0, 255)).astype(jnp.uint8)
            return acc + up_sum + jnp.sum(m8.astype(jnp.int32))

        acc = lax.fori_loop(0, K, chunk, jnp.int32(0))
        return None, acc

    frames = jax.device_put(
        (np.random.default_rng(0).random((T, H, W, 3)) * 255).astype(np.uint8)
    )
    fps = _timed_fps(lambda *a: pipe(*a), (ep, rp, frames), K * T, 2)
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
    d = pipe(rgb)
    d.block_until_ready()
    t0 = _t.perf_counter()
    iters = 5
    for _ in range(iters):
        d = pipe(rgb)
    d.block_until_ready()
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
