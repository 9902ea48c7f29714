"""Can XLA overlap the depth stage (MXU-bound) with the stereo scan
(VPU/Pallas-bound) on ONE chip?

Software-pipelines the bench loop: iteration i computes depth(chunk i)
AND stereo(chunk i-1) — independent dataflow, so the scheduler MAY
interleave MXU matmuls with the stereo stage's vector work. Compares
against the serial formulation (depth then stereo of the same chunk,
as bench.py). If the win is real, the production chunk loop adopts it.

Run: nohup python benchmarks/overlap_probe.py > /tmp/overlap.log 2>&1 &
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


def stereo_of(tr, frames, depths):
    tr, outs = render_chunk(params, tr, frames, depths)
    packed = jnp.concatenate([outs.left, outs.right], axis=2)
    packed_u8 = (jnp.clip(packed * 255.0 + 0.5, 0, 255)).astype(jnp.uint8)
    return tr, jnp.sum(packed_u8.astype(jnp.int32))


@jax.jit
def serial(model_params, trackers, fr):
    def chunk(_, carry):
        tr, acc = carry
        frames = (fr + (acc % 2).astype(jnp.uint8)).astype(jnp.float32) / 255.0
        depths = pred.predict_01(frames, out_hw=(H, W))
        tr, s = stereo_of(tr, frames, depths)
        return tr, acc + s
    return lax.fori_loop(0, K, chunk, (trackers, jnp.int32(0)))


@jax.jit
def pipelined(model_params, trackers, fr):
    def depth_of(acc):
        frames = (fr + (acc % 2).astype(jnp.uint8)).astype(jnp.float32) / 255.0
        return frames, pred.predict_01(frames, out_hw=(H, W))

    def chunk(_, carry):
        tr, acc, frames_p, depths_p = carry
        # depth of THIS chunk and stereo of the PREVIOUS one — independent
        frames_n, depths_n = depth_of(acc)
        tr, s = stereo_of(tr, frames_p, depths_p)
        return tr, acc + s, frames_n, depths_n

    f0, d0 = depth_of(jnp.int32(1))
    tr, acc, f_last, d_last = lax.fori_loop(
        0, K - 1, chunk, (trackers, jnp.int32(0), f0, d0))
    tr, s = stereo_of(tr, f_last, d_last)
    return tr, acc + s


def run(name, fn, iters=3):
    tr = init_trackers(H, W)
    tr, acc = fn(pred.params, tr, frames_u8)
    int(acc)
    t0 = time.perf_counter()
    for _ in range(iters):
        tr, acc = fn(pred.params, tr, frames_u8)
    int(acc)
    dt = time.perf_counter() - t0
    fps = (K * T * iters) / dt
    print(json.dumps({"cfg": name, "fps": round(fps, 2),
                      "ms_per_frame": round(dt / (K * T * iters) * 1e3, 3)}),
          flush=True)


run("serial", serial)
run("pipelined", pipelined)
print("DONE", flush=True)
