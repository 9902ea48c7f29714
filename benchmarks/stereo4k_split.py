"""cfg3 stereo-stage attribution at 4K VR (14.95 ms/frame total).

Same ablation style as stereo_attribution2.py but at the cfg3 config
(2160x3840, bf16, DOF 2.0 with 3 levels, VR pack). Variants:

  full      — render_chunk + VR pack (the cfg3 stereo stage)
  no_dof    — dof_strength=0 (cfg2 has no DOF; is DOF the 4K delta?)
  no_pack   — render_chunk only, Full-SBS-style concat
  no_postfx — feather/heal off
  warp_xla  — XLA shifted-acc warp instead of Pallas

Run: nohup python benchmarks/stereo4k_split.py > /tmp/s4k.log 2>&1 &
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

from visiondepth3d_tpu.ops import formats as fmt_ops
from visiondepth3d_tpu.state import init_trackers
from visiondepth3d_tpu.stereo import StereoParams
from visiondepth3d_tpu.stereo.step import render_chunk

T, K, H, W = 2, 8, 2160, 3840
rng = np.random.default_rng(0)
f4k = jax.device_put(jnp.asarray(rng.random((T, H, W, 3), np.float32)))
d4k = jax.device_put(jnp.asarray(rng.random((T, H, W), np.float32)))


def variant(name, params, pack="VR"):
    @jax.jit
    def loop(carry, f, d):
        def chunk(_, c):
            t, acc = c
            t, outs = render_chunk(params, t, f + acc * 1e-30, d)
            if pack == "VR":
                out = jax.vmap(
                    lambda L, R: fmt_ops.format_3d_output(L, R, "VR")
                )(outs.left, outs.right)
            else:
                out = jnp.concatenate([outs.left, outs.right], axis=2)
            u8 = (jnp.clip(out * 255 + 0.5, 0, 255)).astype(jnp.uint8)
            return t, acc + jnp.sum(u8.astype(jnp.float32)) * 1e-30
        return lax.fori_loop(0, K, chunk, carry)

    carry = loop((init_trackers(H, W), jnp.float32(0)), f4k, d4k)
    float(carry[1])
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        carry = loop(carry, f4k, d4k)
    float(carry[1])
    dt = (time.perf_counter() - t0) / (iters * K * T)
    print(json.dumps({"cfg": name, "ms_per_frame": round(dt * 1e3, 2)}),
          flush=True)


base = StereoParams(dof_strength=2.0, dof_levels=3, enable_healing=True,
                    image_dtype="bfloat16").with_shift_bound(W)

if __name__ == "__main__":
    variant("full", base)
    variant("no_dof", base.replace(dof_strength=0.0))
    variant("no_pack", base, pack="SBS")
    variant("no_postfx", base.replace(enable_feathering=False,
                                      enable_healing=False))
    variant("warp_xla", base.replace(warp_backend="xla"))
    print("DONE", flush=True)
