"""Headline-config stage split: where do the 4.66 ms/frame go?

Times the bench.py pipeline's pieces separately at the exact headline
config (T=32, 1080p, DA-V2-S bf16 @ 518, bf16 stereo, Full-SBS pack):

  depth   — u8 convert + resize to 518 + ViT + resize to 1080p
  stereo  — render_chunk (scan of the fused DIBR step) on held depths
  pack    — SBS concat + u8 quantize + checksum
  full    — all of it (sanity: should reproduce bench.py's number)

Run: nohup python benchmarks/headline_split.py > /tmp/headline_split.log 2>&1 &
"""

# allow `python benchmarks/<script>.py` from anywhere
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/vd3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax import lax

from visiondepth3d_tpu.depth import DA_V2_SMALL, DepthPredictor, init_random
from visiondepth3d_tpu.state import init_trackers
from visiondepth3d_tpu.stereo import StereoParams
from visiondepth3d_tpu.stereo.step import render_chunk

T, K, H, W, SIZE = 32, 16, 1080, 1920, 518

pred = DepthPredictor(DA_V2_SMALL, init_random(DA_V2_SMALL, size=SIZE),
                      inference_size=SIZE, dtype="bfloat16", fast_head=True)
params = StereoParams(enable_healing=True, image_dtype="bfloat16"
                      ).with_shift_bound(W)

rng = np.random.default_rng(0)
frames_u8 = jax.device_put((rng.random((T, H, W, 3)) * 255).astype(np.uint8))
yy, xx = np.mgrid[0:H, 0:W]
d = (xx / W * 0.6 + yy / H * 0.2 + 0.2 * np.sin(xx / 97.0)).astype(np.float32)
depth_fix = jax.device_put(
    np.broadcast_to((d - d.min()) / (d.max() - d.min()), (T, H, W)).copy())


def timed(name, fn, args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (iters * K * T)
    print(json.dumps({"stage": name, "ms_per_frame": round(dt * 1e3, 3),
                      "fps": round(1e3 / (dt * 1e3), 1)}), flush=True)


@jax.jit
def depth_stage(mp, fu8):
    def chunk(_, acc):
        frames = (fu8 + (acc % 2).astype(jnp.uint8)).astype(jnp.float32) / 255.0
        depths = pred.predict_01(frames, out_hw=(H, W))
        return acc + jnp.sum(depths.astype(jnp.float32)).astype(jnp.int32)
    return lax.fori_loop(0, K, chunk, jnp.int32(0))


@jax.jit
def stereo_stage(tr, fu8, de):
    def chunk(_, carry):
        tr, acc = carry
        frames = (fu8 + (acc % 2).astype(jnp.uint8)).astype(jnp.float32) / 255.0
        tr, outs = render_chunk(params, tr, frames, de)
        packed = jnp.concatenate([outs.left, outs.right], axis=2)
        packed_u8 = (jnp.clip(packed * 255.0 + 0.5, 0, 255)).astype(jnp.uint8)
        return tr, acc + jnp.sum(packed_u8.astype(jnp.int32))
    return lax.fori_loop(0, K, chunk, (tr, jnp.int32(0)))


@jax.jit
def full(mp, tr, fu8):
    def chunk(_, carry):
        tr, acc = carry
        frames = (fu8 + (acc % 2).astype(jnp.uint8)).astype(jnp.float32) / 255.0
        depths = pred.predict_01(frames, out_hw=(H, W))
        tr, outs = render_chunk(params, tr, frames, depths)
        packed = jnp.concatenate([outs.left, outs.right], axis=2)
        packed_u8 = (jnp.clip(packed * 255.0 + 0.5, 0, 255)).astype(jnp.uint8)
        return tr, acc + jnp.sum(packed_u8.astype(jnp.int32))
    return lax.fori_loop(0, K, chunk, (tr, jnp.int32(0)))


if __name__ == "__main__":
    timed("depth", depth_stage, (pred.params, frames_u8))
    timed("stereo", stereo_stage, (init_trackers(H, W), frames_u8, depth_fix))
    timed("full", full, (pred.params, init_trackers(H, W), frames_u8))
