"""Small-channel 3x3 conv formulations on TPU (the 6%-MXU problem).

benchmarks/esrgan_split2.py: XLA's NHWC 3x3 conv at 64 channels runs at
~6% MXU (6.48 ms/frame at [2,1080,1920,64]), and that sets the cost of
the whole ESRGAN/RIFE/DPT-head conv inventory. Candidates, all exact:

  conv_xla    — baseline nn.Conv (lax.conv_general_dilated)
  mm9_xla     — sum over 9 taps: statically shifted x @ W[dy,dx] (K=64)
  mm3_xla     — dy-concat [B,H,W,3C] then 3 dx-shifted matmuls (K=192)
  f32_xla     — baseline in f32 (is the bf16 lowering the problem?)

Run: nohup python benchmarks/conv_probe.py > /tmp/convp.log 2>&1 &
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

B, H, W, C, O = 2, 1080, 1920, 64, 64
DT = jnp.bfloat16
rng = np.random.default_rng(0)

x = jnp.asarray(rng.random((B, H, W, C)), DT)
w = jnp.asarray(rng.standard_normal((3, 3, C, O)) * 0.05, DT)
bias = jnp.asarray(rng.standard_normal((O,)) * 0.01, DT)

conv = nn.Conv(O, (3, 3), padding=((1, 1), (1, 1)), dtype=DT)
cp = {"kernel": w, "bias": bias}

GFLOP = B * H * W * C * O * 9 * 2 / 1e9


def timed(name, body, args, inner=16, iters=3):
    def fn(carry, *a):
        return lax.fori_loop(0, inner, lambda _, acc: body(acc, *a), carry)
    jfn = jax.jit(fn)
    c = jfn(jnp.float32(0), *args)
    float(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = jfn(c, *args)
    float(c)
    dt = (time.perf_counter() - t0) / (iters * inner)
    print(json.dumps({"impl": name, "ms_per_frame": round(dt * 1e3 / B, 3),
                      "mxu_pct": round(GFLOP / dt / 1e3 / 394 * 100, 1)}),
          flush=True)


def shift2(a, dy, dx):
    """x shifted so out[y, x] = a[y+dy, x+dx], zero-padded (SAME conv)."""
    return jnp.pad(a, [(0, 0), (max(dy, 0), max(-dy, 0)),
                       (max(dx, 0), max(-dx, 0)), (0, 0)])[
        :, max(-dy, 0):max(-dy, 0) + a.shape[1],
        max(-dx, 0):max(-dx, 0) + a.shape[2]]


def conv_xla(acc, p, x):
    y = conv.apply({"params": p}, x + acc.astype(DT) * 1e-30)
    return acc + jnp.sum(y.astype(jnp.float32)) * 1e-30


def mm9_xla(acc, w, b, x):
    xi = x + acc.astype(DT) * 1e-30
    out = jnp.zeros(xi.shape[:3] + (O,), DT) + b
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            out = out + shift2(xi, dy, dx) @ w[dy + 1, dx + 1]
    return acc + jnp.sum(out.astype(jnp.float32)) * 1e-30


def mm3_xla(acc, w, b, x):
    xi = x + acc.astype(DT) * 1e-30
    rows = jnp.concatenate([shift2(xi, dy, 0) for dy in (-1, 0, 1)], -1)
    w3 = w.reshape(3, 3 * C, O)  # [dx, dyC, O]; rows concat is dy-major
    wd = jnp.swapaxes(w, 0, 1).reshape(3, 3 * C, O)
    out = jnp.zeros(xi.shape[:3] + (O,), DT) + b
    for dx in (-1, 0, 1):
        out = out + shift2(rows, 0, dx) @ wd[dx + 1]
    return acc + jnp.sum(out.astype(jnp.float32)) * 1e-30


convf = nn.Conv(O, (3, 3), padding=((1, 1), (1, 1)))
xf32 = x.astype(jnp.float32)
cpf = {"kernel": w.astype(jnp.float32), "bias": bias.astype(jnp.float32)}


def f32_xla(acc, p, x):
    y = convf.apply({"params": p}, x + acc * 1e-30)
    return acc + jnp.sum(y) * 1e-30


if __name__ == "__main__":
    # numerical sanity on tiny shapes first (CPU-cheap on device too)
    xs = jnp.asarray(rng.random((1, 8, 12, C)), jnp.float32)
    ref = convf.apply({"params": cpf}, xs)
    m9 = sum(shift2(xs, dy, dx) @ cpf["kernel"][dy + 1, dx + 1]
             for dy in (-1, 0, 1) for dx in (-1, 0, 1)) + cpf["bias"]
    rows = jnp.concatenate([shift2(xs, dy, 0) for dy in (-1, 0, 1)], -1)
    wd = jnp.swapaxes(cpf["kernel"], 0, 1).reshape(3, 3 * C, O)
    m3 = sum(shift2(rows, 0, dx) @ wd[dx + 1]
             for dx in (-1, 0, 1)) + cpf["bias"]
    print(json.dumps({
        "m9_err": float(jnp.abs(m9 - ref).max()),
        "m3_err": float(jnp.abs(m3 - ref).max())}), flush=True)

    timed("conv_xla", conv_xla, (cp, x))
    timed("mm9_xla", mm9_xla, (w, bias, x))
    timed("mm3_xla", mm3_xla, (w, bias, x))
    timed("f32_xla", f32_xla, (cpf, xf32), inner=8)
    timed("pallas_conv", pallas_conv, (w, bias, x))
    print("DONE", flush=True)


def pallas_conv(acc, w4, b, x):
    from visiondepth3d_tpu.ops.pallas_conv import conv3x3_pallas

    xi = x + acc.astype(DT) * 1e-30
    y = conv3x3_pallas(xi, w4, b, act="lrelu")
    return acc + jnp.sum(y.astype(jnp.float32)) * 1e-30
