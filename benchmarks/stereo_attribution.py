"""Stereo stage cost attribution on the real chip.

Toggles stages/backends via StereoParams to attribute the per-frame cost
(r1 measurements, f32 1080p: full 5.97 ms, warp=xla +7.9, heal -0.99,
feather -0.37, edge-mask -0.10, grade+sharpen ~0, exact quantiles +8.3).
Run with nohup and poll; see .claude/skills/verify/SKILL.md TPU notes."""

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

T, K, H, W = 8, 32, 1080, 1920
rng = np.random.default_rng(0)
frames = jax.device_put((rng.random((T, H, W, 3))).astype(np.float32))
# smooth-ish depth (random noise maxes out edge masks; use a ramp + blobs)
yy, xx = np.mgrid[0:H, 0:W]
d = (xx / W * 0.6 + yy / H * 0.2 + 0.2 * np.sin(xx / 97.0)).astype(np.float32)
depth_fix = jax.device_put(np.broadcast_to((d - d.min()) / (d.max() - d.min()),
                                           (T, H, W)).copy())


def make(p):
    @jax.jit
    def fn(trackers, fr, de, seed):
        def chunk(_, carry):
            tr, acc = carry
            f = fr + acc * 1e-30
            tr, outs = render_chunk(p, tr, f, de)
            return tr, acc + jnp.sum(outs.left) + jnp.sum(outs.right)
        return lax.fori_loop(0, K, chunk, (trackers, jnp.float32(0)))
    return fn


def run(name, p, iters=3):
    fn = make(p)
    args = (init_trackers(H, W), frames, depth_fix, jnp.float32(0))
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


base = StereoParams(enable_healing=True).with_shift_bound(W)
run("full", base)
run("warp=xla", base.replace(warp_backend="xla"))
run("no_feather", base.replace(enable_feathering=False))
run("no_heal", base.replace(enable_healing=False))
run("no_edge_mask", base.replace(enable_edge_masking=False))
run("exact_quantiles", base.replace(quantile_mode="exact"))
run("no_sharpen_grade", base.replace(sharpness_factor=0.0,
                                     color_saturation=1.0,
                                     color_contrast=1.0,
                                     color_brightness=0.0))
print("DONE", flush=True)
