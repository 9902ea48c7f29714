"""Micro: where does the DPT fast head's ~1.07 ms/frame go, and can the
small-channel 3x3 convs be formulated faster?

The head is ~15-20 GFLOP/frame (0.05 ms at bf16 MXU peak) yet measures
1.07 ms (depth_split.py model - backbone). Suspects: XLA's TPU lowering
of 64/32-channel 3x3 convs (128-lane underfill), the fusion resizes, or
the reassemble upsample einsums.

Pieces (B=32 frames, DA-V2-S shapes, bf16):
  conv148   — one nn.Conv 3x3 64->64 at [B,148,148,64]  (fusion workhorse)
  conv296   — one nn.Conv 3x3 64->32 at [B,296,296,64]  (head_conv1)
  im2col148 — same math as conv148 via explicit shifted-adds of 9 matmuls
  wide148   — conv148 with space-to-depth x2: [B,74,74,256] 3x3 256->256
              has the SAME receptive-field FLOPs class but full lanes
              (not numerically equal; a formulation probe, not parity)
  fusion    — one full FeatureFusionLayer at 148^2 (4 convs + resize + proj)
  neck      — reassemble+scratch for all 4 levels from [B,1370,384] tokens
  head      — the full DPTNeckHead fast path from token feats (reference)

Run: nohup python benchmarks/head_pieces.py > /tmp/head_pieces.log 2>&1 &
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
from flax import linen as nn
from jax import lax

B = 32
DT = jnp.bfloat16


def timed(name, make_fn, args, gflop_per_iter, iters=3, inner=8):
    fn = jax.jit(make_fn)
    carry = fn(jnp.float32(0), *args)
    float(carry)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = fn(carry, *args)
    float(carry)
    dt = (time.perf_counter() - t0) / (iters * inner)
    eff = gflop_per_iter / dt / 1e3 / 394.0 * 100  # % of v5e bf16 peak
    print(json.dumps({"piece": name, "ms": round(dt * 1e3, 3),
                      "ms_per_frame": round(dt * 1e3 / B, 4),
                      "mxu_pct": round(eff, 1)}), flush=True)


def loop(body):
    def fn(carry, *args):
        def it(_, acc):
            return body(acc, *args)
        return lax.fori_loop(0, 8, it, carry)
    return fn


rng = np.random.default_rng(0)


def conv_piece(h, cin, cout):
    conv = nn.Conv(cout, (3, 3), padding=((1, 1), (1, 1)), dtype=DT)
    x = jnp.asarray(rng.standard_normal((B, h, h, cin)), DT)
    p = conv.init(jax.random.PRNGKey(0), x)["params"]
    p = jax.tree.map(lambda a: a.astype(DT), p)

    def body(acc, p, x):
        y = conv.apply({"params": p}, x + acc.astype(DT) * 1e-30)
        return acc + jnp.sum(y.astype(jnp.float32)) * 1e-30

    gflop = 8 * B * h * h * cin * cout * 9 * 2 / 1e9
    return body, (p, x), gflop


def im2col_piece(h, c):
    x = jnp.asarray(rng.standard_normal((B, h, h, c)), DT)
    w9 = jnp.asarray(rng.standard_normal((9, c, c)) * 0.05, DT)

    def body(acc, w9, x):
        xi = x + acc.astype(DT) * 1e-30
        out = jnp.zeros_like(xi)
        k = 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                sh = jnp.roll(xi, (dy, dx), axis=(1, 2))
                out = out + sh @ w9[k]
                k += 1
        return acc + jnp.sum(out.astype(jnp.float32)) * 1e-30

    gflop = 8 * B * h * h * c * c * 9 * 2 / 1e9
    return body, (w9, x), gflop


def fusion_piece():
    from visiondepth3d_tpu.depth.dpt import FeatureFusionLayer

    layer = FeatureFusionLayer(64)
    x = jnp.asarray(rng.standard_normal((B, 148, 148, 64)), DT)
    r = jnp.asarray(rng.standard_normal((B, 148, 148, 64)), DT)
    p = layer.init(jax.random.PRNGKey(0), x, r)["params"]
    p = jax.tree.map(lambda a: a.astype(DT), p)

    def body(acc, p, x, r):
        y = layer.apply({"params": p}, x + acc.astype(DT) * 1e-30, r)
        return acc + jnp.sum(y.astype(jnp.float32)) * 1e-30

    # 4 convs 3x3 64x64 @148^2 + proj 1x1 @296^2
    gflop = 8 * B * (4 * 148 * 148 * 64 * 64 * 9 * 2 +
                     296 * 296 * 64 * 64 * 2) / 1e9
    return body, (p, x, r), gflop


def head_piece(fast=True):
    from visiondepth3d_tpu.depth import DA_V2_SMALL
    from visiondepth3d_tpu.depth.dpt import DPTNeckHead

    head = DPTNeckHead(DA_V2_SMALL, fast_head=fast)
    feats = [jnp.asarray(rng.standard_normal((B, 1370, 384)), DT)
             for _ in range(4)]
    p = head.init(jax.random.PRNGKey(0), feats, (37, 37))["params"]
    p = jax.tree.map(lambda a: a.astype(DT), p)

    def body(acc, p, *feats):
        f = [x + acc.astype(DT) * 1e-30 for x in feats]
        y = head.apply({"params": p}, f, (37, 37))
        return acc + jnp.sum(y.astype(jnp.float32)) * 1e-30

    return body, (p, *feats), 0.0


if __name__ == "__main__":
    for name, (body, args, g) in [
        ("conv148_64to64", conv_piece(148, 64, 64)),
        ("conv296_64to32", conv_piece(296, 64, 32)),
        ("conv74_256to256", conv_piece(74, 256, 256)),
        ("im2col148_64", im2col_piece(148, 64)),
        ("fusion148", fusion_piece()),
        ("head_fast_full", head_piece(True)),
    ]:
        timed(name, loop(body), args, g)
    print("DONE", flush=True)
