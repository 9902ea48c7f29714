"""Depth-statistics micro: where do normalize_scan's 0.98 ms/frame go?

Variants isolate: the temporal-smooth scan baseline, the bisection
quantile (iters x passes over HBM), subsampled bisection (4x less
traffic), and the 64-bin subject histogram. Guides whether the fix is a
VMEM-resident Pallas stats kernel (traffic-bound) or fewer iterations
(overhead-bound).

Run: nohup python benchmarks/stats_micro.py > /tmp/stats_micro.log 2>&1 &
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

from visiondepth3d_tpu.ops.quantiles import bisect_quantile_01, histogram_01

T, K, H, W = 32, 16, 1080, 1920
rng = np.random.default_rng(0)
dep = jax.device_put(rng.random((T, H, W)).astype(np.float32))
Q2 = jnp.asarray([0.02, 0.98], jnp.float32)


def timed(name, fn, iters=3):
    f = jax.jit(fn)
    carry = f(jnp.float32(0), dep)
    float(carry)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = f(carry, dep)
    float(carry)
    dt = (time.perf_counter() - t0) / (iters * K * T)
    print(json.dumps({"op": name, "ms_per_frame": round(dt * 1e3, 4)}),
          flush=True)


def runner(per_frame):
    def fn(acc, de):
        def outer(_, a):
            def step(c, d):
                return c + per_frame(d + a * 1e-30), None
            return lax.scan(step, a, de)[0]
        return lax.fori_loop(0, K, outer, acc)
    return fn


# scan baseline: temporal-smooth-like EMA (pure elementwise, no stats)
timed("ema_only", runner(lambda d: jnp.sum(d * 0.5 + 0.25) * 1e-9))

# current bisection quantile pair
timed("bisect16", runner(
    lambda d: jnp.sum(bisect_quantile_01(d, Q2, iters=16))))
timed("bisect8", runner(
    lambda d: jnp.sum(bisect_quantile_01(d, Q2, iters=8))))


# subject-style 64-bin histogram on the 60% crop with validity mask
def hist_crop(d):
    crop = d[H // 5: H * 4 // 5, W // 5: W * 4 // 5]
    valid = (crop > 0.05) & (crop < 0.95)
    return jnp.sum(histogram_01(crop, 64, valid)) * 1e-9


timed("hist64_crop", runner(hist_crop))
print("DONE", flush=True)
