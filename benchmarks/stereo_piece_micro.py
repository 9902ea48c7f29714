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
    f = jax.jit(fn)
    carry = f(jnp.float32(0))
    float(carry)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = f(carry)
    float(carry)
    dt = (time.perf_counter() - t0) / (iters * K * T)
    print(json.dumps({"op": name, "ms_per_frame": round(dt * 1e3, 4)}),
          flush=True)


def loop(body):
    """body: (x_img, x_dep) -> scalar contribution; K reps, carry-chained."""
    def outer(acc):
        def step(_, a):
            out = body(img + a * jnp.bfloat16(1e-30), dep + a * 1e-30)
            return a + out.astype(jnp.float32)
        return lax.fori_loop(0, K, step, acc)
    return outer


# sharpen both eyes (3x3 conv, C=3, reflect-101)
timed("sharpen_x2", loop(lambda fr, de: jnp.sum(
    filters.sharpen(fr, 1.0).astype(jnp.float32)) * 2 * 0 + jnp.sum(
    filters.sharpen(fr, 1.0)) + jnp.sum(filters.sharpen(fr, 0.8))))

# color grade both eyes
timed("grade_x2", loop(lambda fr, de: jnp.sum(
    grade.apply_color_grade(fr, 1.0, 1.0, 0.0)) + jnp.sum(
    grade.apply_color_grade(fr, 1.1, 1.0, 0.0))))

# temporal EMA + percentile-EMA normalize over a scanned chunk
def norm_chunk(fr, de):
    t0 = init_trackers(H, W)

    def body(c, d):
        c, ds = trk.temporal_depth_smooth(c, d, alpha=0.5)
        c, dn = trk.percentile_ema_normalize(c, ds, 0.02, 0.98, 0.92, "hist")
        return c, jnp.sum(dn)

    _, sums = lax.scan(body, t0, de)
    return jnp.sum(sums)


timed("normalize_scan", norm_chunk)

# subject histogram estimate x2 + pop shaping (per-frame via vmap)
def shape_all(fr, de):
    def one(d):
        s = subject.estimate_subject_depth(d, "hist")
        sh = shape_depth_for_pop(d, s, stretch_lo=0.05, stretch_hi=0.95,
                                 depth_mid=0.5, gamma=0.85,
                                 quantile_mode="hist")
        return jnp.sum(sh) + subject.estimate_subject_depth(sh, "hist")
    return jnp.sum(jax.vmap(one)(de))


timed("subject_pop", shape_all)

# u8 pack (the round-trip the chunk does at the end)
timed("quantize_pack", loop(lambda fr, de: jnp.sum(
    (jnp.clip(fr.astype(jnp.float32), 0, 1) * 255.0 + 0.5)
    .astype(jnp.uint8).astype(jnp.float32))))
print("DONE", flush=True)
