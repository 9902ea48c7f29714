"""GN+SiLU+conv fusion feasibility at the diffusion resnet shape.

resnet_gn_probe: level-0 block = convs 2.34 ms (37% MXU) + GN/SiLU 1.15.
A fused Pallas kernel only pays off if the Pallas conv can at least MATCH
XLA's conv at [5, 96, 96, 320->320] — at this K=2880 contraction the MXU
shape is far friendlier than the 64-ch regime where cat9 plateaued at
17%. Gate question first, fusion second:

  xla_conv     — nn.Conv baseline (what the resnet uses)
  pallas_cat3  — ops/pallas_conv.py at 320ch (existing kernel, no GN)
  pallas_mm9   — same, mm9 variant
  xla_gn_conv  — GroupNorm+SiLU+conv in XLA (the thing to beat: 1.17+0.58)

If pallas >= xla_conv, the fusion idea dies here (recorded negative); if
pallas wins, the follow-up is normalizing on the tap load.

Run: nohup python benchmarks/gn_conv_probe.py > /tmp/gn_conv.out 2>&1 &
"""

from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import numpy as np

E, S, C = 5, 96, 320


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vd3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from visiondepth3d_tpu.ops.pallas_conv import conv3x3_pallas

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((E, S, S, C)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.02, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((C,)) * 0.01, jnp.bfloat16)

    def timed(label, fn, inner=8, iters=3):
        @jax.jit
        def run(acc0, xx):
            def body(_, acc):
                y = fn(xx + acc.astype(xx.dtype) * 1e-30)
                return acc + jnp.sum(
                    y.reshape(-1)[:64].astype(jnp.float32)) * 1e-30

            return lax.fori_loop(0, inner, body, acc0)

        acc = run(jnp.float32(0), x)
        _ = float(acc)
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = run(acc, x)
        _ = float(acc)
        ms = (time.perf_counter() - t0) / (iters * inner) * 1000
        print(json.dumps({"variant": label, "ms": round(ms, 3)}), flush=True)
        return ms

    def xla_conv(xx):
        y = lax.conv_general_dilated(
            xx, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b

    timed("xla_conv", xla_conv)

    for variant in ("cat3", "mm9"):
        try:
            timed(f"pallas_{variant}",
                  lambda xx, v=variant: conv3x3_pallas(xx, k, b, variant=v))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": f"pallas_{variant}",
                              "error": str(e)[:150]}), flush=True)

    gn = nn.GroupNorm(32, epsilon=1e-5)
    gp = gn.init(jax.random.PRNGKey(0), x)["params"]
    gp = jax.tree.map(lambda p: jnp.asarray(np.asarray(p), jnp.bfloat16), gp)

    def xla_gn_conv(xx):
        h = jax.nn.silu(gn.apply({"params": gp}, xx))
        return xla_conv(h)

    timed("xla_gn_silu_conv", xla_gn_conv)


if __name__ == "__main__":
    main()
