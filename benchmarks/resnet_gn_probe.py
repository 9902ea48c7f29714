"""Post-attention-fix Marigold resnet split: is GroupNorm worth fusing?

After the r5 flash fix the UNet step is ~131 ms; resnets are the largest
remaining slice. This probe splits one level-0 ResnetBlock
([E5, 96, 96, 320] bf16) into its parts, inner-looped (fori 8) so the
~4 ms relay launch floor amortizes:

  resnet  — full ResnetBlock (2x GN+SiLU+conv + temb add)
  convs   — just the two 3x3 320->320 convs
  gnsilu  — just the two GroupNorm+SiLU pairs
  gn_conv_fused_est = resnet - convs - gnsilu ~ overhead recoverable by
  a fused kernel (if gnsilu is large and the est is near zero, a Pallas
  GN+SiLU+conv fusion saves ~gnsilu of HBM round-trips per pair).

Run: nohup python benchmarks/resnet_gn_probe.py > /tmp/resnet_gn.out 2>&1 &
"""

from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vd3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from visiondepth3d_tpu.depth.diffusion.unet2d import ResnetBlock
    from visiondepth3d_tpu.depth.model import init_random_model_args

    E, S, C = 5, 96, 320
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((E, S, S, C)), jnp.bfloat16)
    temb = jnp.asarray(rng.standard_normal((E, 1280)), jnp.bfloat16)

    def timed(label, mod, args, inner=8, iters=3):
        specs = tuple(jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args)
        params = init_random_model_args(mod, specs)
        params = jax.device_put(jax.tree.map(
            lambda p: jnp.asarray(p, jnp.bfloat16), params))

        @jax.jit
        def run(acc0, params, *a):
            def body(_, acc):
                xin = a[0] + acc.astype(a[0].dtype) * 1e-30
                y = mod.apply({"params": params}, xin, *a[1:])
                return acc + jnp.sum(y.astype(jnp.float32)) * 1e-30

            return lax.fori_loop(0, inner, body, acc0)

        acc = run(jnp.float32(0), params, *args)
        _ = float(acc)
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = run(acc, params, *args)
        _ = float(acc)
        ms = (time.perf_counter() - t0) / (iters * inner) * 1000
        print(json.dumps({"piece": label, "ms": round(ms, 3)}), flush=True)
        return ms

    class TwoConvs(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Conv(C, (3, 3), padding=((1, 1), (1, 1)), name="c1")(x)
            return nn.Conv(C, (3, 3), padding=((1, 1), (1, 1)), name="c2")(h)

    class TwoGN(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = jax.nn.silu(nn.GroupNorm(32, epsilon=1e-5, name="n1")(x))
            return jax.nn.silu(nn.GroupNorm(32, epsilon=1e-5, name="n2")(h))

    r = timed("resnet_L0", ResnetBlock(C, 32), (x, temb))
    c = timed("two_convs", TwoConvs(), (x,))
    g = timed("two_gn_silu", TwoGN(), (x,))
    gflop = 2 * E * S * S * C * C * 9 * 2 / 1e9
    print(json.dumps({
        "conv_gflop": round(gflop, 1),
        "conv_mxu_pct": round(gflop / c / 1e3 / 197e12 * 1e12 * 100, 1),
        "residual_ms": round(r - c - g, 3),
        "note": "residual ~ temb dense + adds + scheduling; gnsilu is the "
                "upper bound a GN+SiLU+conv fusion could recover",
    }), flush=True)


if __name__ == "__main__":
    main()
