"""Stage-PP overlap measurement on the 8-device virtual CPU mesh.

Runs the same depth->stereo workload two ways over N chunks:
- serial: one device group does depth then stereo for each chunk;
- stage-PP: `parallel.pp.TwoStagePipeline` splits the mesh, depth of
  chunk i+1 overlaps stereo of chunk i (async dispatch).

On real multi-chip hardware the win is bounded by sum(stages) vs
max(stage). The virtual CPU mesh CANNOT show that win: all 8 virtual
devices share the same host cores, so total work — not critical path —
sets the wall clock and the ideal ratio is ~1.0 by construction. What
this harness DOES establish is that the pipelined driver adds no
overhead versus the serial loop (ratio >= ~1.0; measured 1.03) while
tests/test_stage_pp.py pins its numerical parity. The real-hardware
speedup claim rests on the design (disjoint device slices + async
dispatch), not on this rig.

Run: ``python benchmarks/stage_pp_overlap.py``
"""

# allow `python benchmarks/<script>.py` from anywhere
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from visiondepth3d_tpu.depth import DA_TINY, DepthPredictor, init_random
from visiondepth3d_tpu.ops.resize import resize_bilinear
from visiondepth3d_tpu.parallel import TwoStagePipeline, init_trackers_batch
from visiondepth3d_tpu.parallel.dp import render_segments
from visiondepth3d_tpu.stereo import StereoParams


def main():
    h, w, g, t, n_chunks = 96, 128, 4, 4, 8
    pred = DepthPredictor(DA_TINY, init_random(DA_TINY, size=56),
                          inference_size=56)
    p = StereoParams(blur_ksize=3)

    def depth_fn(frames):  # [G, T, H, W, 3] u8
        gg, tt = frames.shape[0], frames.shape[1]
        x = frames.reshape((gg * tt,) + frames.shape[2:])
        x = x.astype(jnp.float32) / 255.0
        d = pred._forward(pred.params, x)
        lo = jnp.min(d, axis=(1, 2), keepdims=True)
        hi = jnp.max(d, axis=(1, 2), keepdims=True)
        d = (d - lo) / jnp.maximum(hi - lo, 1e-6)
        d = resize_bilinear(d, (h, w), channel_last=False)
        return d.reshape(gg, tt, h, w)

    def stage_b(tr, frames, depths):
        f01 = frames.astype(jnp.float32) / 255.0
        return render_segments(p, tr, f01, depths)

    rng = np.random.default_rng(0)
    chunks = [rng.integers(0, 255, (g, t, h, w, 3)).astype(np.uint8)
              for _ in range(n_chunks)]
    devices = jax.devices()[:8]

    # --- stage-PP over a 4/4 split ---
    pipe = TwoStagePipeline(devices, split=4, depth_fn=depth_fn,
                            stage_b_fn=stage_b)
    carry0 = jax.device_put(init_trackers_batch(g, h, w), pipe.sh_b)
    list(pipe.run(iter(chunks[:2]), carry0))  # warm both stage compiles
    t0 = time.perf_counter()
    outs = list(pipe.run(iter(chunks), carry0))
    outs[-1].left.block_until_ready()
    dt_pp = time.perf_counter() - t0

    # --- serial on the same stage-A slice (apples-to-apples devices) ---
    depth_j = jax.jit(depth_fn)
    stage_j = jax.jit(stage_b)
    carry = init_trackers_batch(g, h, w)
    d0 = depth_j(jnp.asarray(chunks[0]))
    carry_w, _ = stage_j(carry, jnp.asarray(chunks[0]), d0)  # warm
    t0 = time.perf_counter()
    c = carry
    for ch in chunks:
        ch = jnp.asarray(ch)
        d = depth_j(ch)
        c, out = stage_j(c, ch, d)
    out.left.block_until_ready()
    dt_serial = time.perf_counter() - t0

    print(json.dumps({
        "metric": "stage-PP vs serial, 8-dev virtual mesh",
        "serial_s": round(dt_serial, 3),
        "pipelined_s": round(dt_pp, 3),
        "speedup": round(dt_serial / dt_pp, 3),
        "chunks": n_chunks,
    }))


if __name__ == "__main__":
    main()
