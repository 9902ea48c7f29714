"""On-chip check of the Pallas stats kernels: parity vs XLA + timing.

Run: nohup python benchmarks/stats_kernel_check.py > /tmp/stats_kernel.log 2>&1 &
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

from visiondepth3d_tpu.ops.pallas_stats import (
    quantile_pair_pallas, subject_stats_pallas)
from visiondepth3d_tpu.ops.quantiles import (
    bisect_quantile_01, hist_masked_median, histogram_01)

T, K, H, W = 32, 16, 1080, 1920
CH, CW = 648, 1152
rng = np.random.default_rng(0)
dep = jax.device_put(rng.random((T, H, W)).astype(np.float32))
Q2 = jnp.asarray([0.02, 0.98], jnp.float32)

# ---- parity on one frame
d0 = dep[0]
got = np.asarray(jax.jit(lambda x: quantile_pair_pallas(x, Q2))(d0))
ref = np.asarray(jax.jit(lambda x: bisect_quantile_01(x, Q2, iters=12))(d0))
print(json.dumps({"check": "qpair", "got": got.tolist(), "ref": ref.tolist(),
                  "max_err": float(np.abs(got - ref).max())}), flush=True)

crop = d0[:CH, :CW]
h2, c2, m2 = jax.jit(lambda x: subject_stats_pallas(x, 64))(crop)
valid = (crop > 0.05) & (crop < 0.95)
hist_ref = jax.jit(lambda x, v: histogram_01(x, 64, v))(crop, valid)
med_ref = jax.jit(lambda x, v: hist_masked_median(x, v))(crop, valid)
print(json.dumps({
    "check": "subject",
    "hist_max_err": float(np.abs(np.asarray(h2) - np.asarray(hist_ref)).max()),
    "count_err": float(c2) - float(jnp.sum(valid)),
    "med_err": float(m2) - float(med_ref),
}), flush=True)


# ---- timing (chained carry, scanned per frame like production)
def timed(name, per_frame, iters=3):
    def fn(acc, de):
        def outer(_, a):
            def step(c, d):
                return c + per_frame(d + a * 1e-30), None
            return lax.scan(step, a, de)[0]
        return lax.fori_loop(0, K, outer, acc)
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


timed("qpair_pallas", lambda d: jnp.sum(quantile_pair_pallas(d, Q2)))
timed("qpair_xla", lambda d: jnp.sum(bisect_quantile_01(d, Q2, iters=12)))
timed("subject_pallas", lambda d: (
    lambda r: jnp.sum(r[0]) * 1e-9 + r[1] * 1e-9 + r[2]
)(subject_stats_pallas(d[:CH, :CW], 64)))


def subject_xla(d):
    crop = d[:CH, :CW]
    valid = (crop > 0.05) & (crop < 0.95)
    return (jnp.sum(histogram_01(crop, 64, valid)) * 1e-9
            + hist_masked_median(crop, valid))


timed("subject_xla", subject_xla)
print("DONE", flush=True)
