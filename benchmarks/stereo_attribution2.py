"""Stereo stage cost attribution, round 2: the bf16 production config.

The honest headline split (headline_split.py) puts the stereo stage at
4.23 ms/frame bf16 — the larger half of the 8.19 ms e2e budget. This
harness isolates where it goes, with the same measurement discipline
(K chunks per launch, carry-chained inputs, host readback fence).

Run: nohup python benchmarks/stereo_attribution2.py > /tmp/attr2.log 2>&1 &
"""

# allow `python benchmarks/<script>.py` from anywhere
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time, json
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/vd3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax import lax

from visiondepth3d_tpu.state import init_trackers
from visiondepth3d_tpu.stereo import StereoParams
from visiondepth3d_tpu.stereo.step import render_chunk

T, K, H, W = 32, 16, 1080, 1920
rng = np.random.default_rng(0)
frames = jax.device_put((rng.random((T, H, W, 3))).astype(np.float32))
yy, xx = np.mgrid[0:H, 0:W]
d = (xx / W * 0.6 + yy / H * 0.2 + 0.2 * np.sin(xx / 97.0)).astype(np.float32)
depth_fix = jax.device_put(np.broadcast_to((d - d.min()) / (d.max() - d.min()),
                                           (T, H, W)).copy())


def make(p):
    @jax.jit
    def fn(trackers, fr, de):
        def chunk(_, carry):
            tr, acc = carry
            f = fr + acc * 1e-30
            tr, outs = render_chunk(p, tr, f, de)
            return tr, acc + jnp.sum(outs.left.astype(jnp.float32)) + jnp.sum(
                outs.right.astype(jnp.float32))
        return lax.fori_loop(0, K, chunk, (trackers, jnp.float32(0)))
    return fn


def run(name, p, iters=3):
    fn = make(p)
    args = (init_trackers(H, W), frames, depth_fix)
    float(fn(*args)[1])
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    float(out[1])
    dt = time.perf_counter() - t0
    n = K * T * iters
    print(json.dumps({"cfg": name, "ms_per_frame": round(dt / n * 1e3, 3)}),
          flush=True)


base = StereoParams(enable_healing=True, image_dtype="bfloat16"
                    ).with_shift_bound(W)
run("full_bf16", base)
run("no_postfx", base.replace(enable_feathering=False, enable_healing=False))
run("warp_xla", base.replace(warp_backend="xla"))
run("no_subject", base.replace(use_subject_tracking=False,
                               enable_floating_window=False,
                               enable_dynamic_parallax=False))
run("minimal", base.replace(enable_feathering=False, enable_healing=False,
                            enable_edge_masking=False,
                            use_subject_tracking=False,
                            enable_floating_window=False,
                            enable_dynamic_parallax=False,
                            enable_curvature=False))
run("full_f32", StereoParams(enable_healing=True).with_shift_bound(W))
print("DONE", flush=True)
