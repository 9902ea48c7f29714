"""Depth-stage internal split: backbone vs DPT head vs pre/post scaffolding.

headline_split.py puts the whole depth stage (u8 convert + resize-to-518 +
DA-V2-S bf16 + min-max + resize-to-1080p) at 3.67 ms/frame, of which the
attention probes account for ~1.1. This slices the rest:

  scaffold — u8 convert + resize down + normalize stats + resize up
             (identity "model": min over channels)
  backbone — ViT-S forward only ([T,518,518,3] -> tokens)
  model    — full DepthAnything forward (backbone + DPT neck/head)

Run: nohup python benchmarks/depth_split.py > /tmp/depth_split.log 2>&1 &
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
from visiondepth3d_tpu.depth.dpt import Dinov2Backbone
from visiondepth3d_tpu.ops.resize import resize_bilinear

T, K, H, W, SIZE = 32, 16, 1080, 1920, 518

pred = DepthPredictor(DA_V2_SMALL, init_random(DA_V2_SMALL, size=SIZE),
                      inference_size=SIZE, dtype="bfloat16", fast_head=True)
rng = np.random.default_rng(0)
frames_u8 = jax.device_put((rng.random((T, H, W, 3)) * 255).astype(np.uint8))
x518 = jax.device_put(rng.standard_normal((T, SIZE, SIZE, 3)).astype(np.float32))


def timed(name, fn, args, iters=3):
    # each fn takes (carry, *data) and returns a scalar carry; chaining the
    # carry across iterations serializes them AND makes every launch's args
    # unique — repeated identical (program, args) launches through the axon
    # relay otherwise return near-instantly (dedup), reading 0.0 ms
    carry = fn(jnp.float32(0), *args)
    float(carry)  # NOT block_until_ready: on axon that returns at dispatch,
    t0 = time.perf_counter()  # only a host transfer truly syncs
    for _ in range(iters):
        carry = fn(carry, *args)
    float(carry)
    dt = (time.perf_counter() - t0) / (iters * K * T)
    print(json.dumps({"stage": name, "ms_per_frame": round(dt * 1e3, 3)}),
          flush=True)


@jax.jit
def scaffold(carry, fu8):
    def it(_, acc):
        frames = (fu8 + (acc % 2).astype(jnp.uint8)).astype(jnp.float32) / 255.0
        x = resize_bilinear(frames.astype(jnp.bfloat16), (SIZE, SIZE),
                            channel_last=True, precision="default")
        d = jnp.min(x.astype(jnp.float32), axis=-1)  # stand-in "model"
        lo = jnp.min(d, axis=(1, 2), keepdims=True)
        hi = jnp.max(d, axis=(1, 2), keepdims=True)
        d01 = (d - lo) / jnp.maximum(hi - lo, 1e-6)
        up = resize_bilinear(d01, (H, W), channel_last=False)
        return acc + jnp.sum(up).astype(jnp.int32)
    return lax.fori_loop(0, K, it, carry.astype(jnp.int32)).astype(jnp.float32)


backbone = Dinov2Backbone(DA_V2_SMALL.backbone, DA_V2_SMALL.out_indices)
bb_params = pred.params["backbone"]


@jax.jit
def backbone_only(carry, bp, x):
    def it(_, acc):
        xi = (x + acc * 1e-30).astype(jnp.bfloat16)
        feats, _ = backbone.apply({"params": bp}, xi)
        return acc + sum(jnp.sum(f.astype(jnp.float32)) for f in feats) * 1e-30
    return lax.fori_loop(0, K, it, carry)


@jax.jit
def full_forward(carry, mp, x):
    def it(_, acc):
        xi = (x + acc * 1e-30).astype(jnp.bfloat16)
        d = pred.model.apply({"params": mp}, xi)
        return acc + jnp.sum(d.astype(jnp.float32)) * 1e-30
    return lax.fori_loop(0, K, it, carry)


if __name__ == "__main__":
    timed("scaffold", scaffold, (frames_u8,))
    timed("backbone", backbone_only, (bb_params, x518))
    timed("model", full_forward, (pred.params, x518))
