"""Per-op timing of the stereo stage's non-warp pieces at 1080p bf16.

attr2.log: full 4.25 ms/frame, warp 1.27, postfx 0.59, subject 0.14 —
leaving ~2.2 ms across normalize/shaping/grade/sharpen/quantize/scan.
This times each piece standalone with the chained-carry + host-readback
discipline (see bench.py): repeated identical launches dedup through the
axon relay and `block_until_ready` returns at dispatch there, so every
iteration's input depends on the previous checksum and the only sync is
a scalar host read.

Run: nohup python benchmarks/stereo_piece_micro.py > /tmp/piece_micro.log 2>&1 &
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

from visiondepth3d_tpu.ops import filters, grade, subject
from visiondepth3d_tpu.ops.depth_shaping import shape_depth_for_pop
from visiondepth3d_tpu.state import init_trackers
from visiondepth3d_tpu.state import trackers as trk

T, K, H, W = 32, 16, 1080, 1920
rng = np.random.default_rng(0)
img = jax.device_put(rng.random((T, H, W, 3)).astype(np.float32)
                     .astype(jnp.bfloat16))
dep = jax.device_put(rng.random((T, H, W)).astype(np.float32))


def timed(name, fn, iters=3):
    # img/dep passed as explicit args: closed-over device arrays embed as
    # HLO constants and overflow the relay's request body limit (HTTP 413)
    f = jax.jit(fn)
    carry = f(jnp.float32(0), img, dep)
    float(carry)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = f(carry, img, dep)
    float(carry)
    dt = (time.perf_counter() - t0) / (iters * K * T)
    print(json.dumps({"op": name, "ms_per_frame": round(dt * 1e3, 4)}),
          flush=True)


def loop(body):
    """body: (x_img, x_dep) -> scalar contribution; K reps, carry-chained."""
    def outer(acc, im, de):
        def step(_, a):
            out = body(im + a.astype(im.dtype) * jnp.asarray(1e-30, im.dtype),
                       de + a * 1e-30)
            return a + out.astype(jnp.float32)
        return lax.fori_loop(0, K, step, acc)
    return outer


def scanned(per_frame):
    """Run a per-frame [H, W, ...] op under lax.scan like production."""
    def body(fr, de):
        def step(c, xs):
            f, d = xs
            return c + per_frame(f, d), None
        return lax.scan(step, jnp.float32(0), (fr, de))[0]
    return body


# sharpen both eyes (3x3 stencil, C=3, reflect-101)
timed("sharpen_x2", loop(scanned(lambda f, d: jnp.sum(
    filters.sharpen(f, 1.0)).astype(jnp.float32) + jnp.sum(
    filters.sharpen(f, 0.8)).astype(jnp.float32))))

# color grade both eyes
timed("grade_x2", loop(scanned(lambda f, d: jnp.sum(
    grade.apply_color_grade(f, 1.0, 1.0, 0.0)).astype(jnp.float32) + jnp.sum(
    grade.apply_color_grade(f, 1.1, 1.0, 0.0)).astype(jnp.float32))))

# temporal EMA + percentile-EMA normalize over a scanned chunk
def norm_chunk(acc, fr, de):
    t0 = init_trackers(H, W)

    def body(c, d):
        c, ds = trk.temporal_depth_smooth(c, d, alpha=0.5)
        c, dn = trk.percentile_ema_normalize(c, ds, 0.02, 0.98, 0.92, "hist")
        return c, jnp.sum(dn)

    def outer(_, a):
        _, sums = lax.scan(body, t0, de + a * 1e-30)
        return a + jnp.sum(sums)
    return lax.fori_loop(0, K, outer, acc)


timed("normalize_scan", norm_chunk)

# subject histogram estimate x2 + pop shaping
timed("subject_pop", loop(scanned(lambda f, d: (
    lambda s: jnp.sum(shape_depth_for_pop(
        d, s, stretch_lo=0.05, stretch_hi=0.95, depth_mid=0.5,
        gamma=0.85, quantile_mode="hist")) + s
)(subject.estimate_subject_depth(d, "hist")))))

# u8 pack (the round-trip the chunk does at the end)
timed("quantize_pack", loop(scanned(lambda f, d: jnp.sum(
    (jnp.clip(f.astype(jnp.float32), 0, 1) * 255.0 + 0.5)
    .astype(jnp.uint8).astype(jnp.float32)))))
print("DONE", flush=True)
