"""cfg4 headroom probe: int8 convolution throughput on v5e (VERDICT item 4).

The measured small-channel conv ceiling is ~12% of bf16 peak for XLA and
~17% for the Pallas cat9 kernel (benchmarks/RESULTS.md). v5e's MXU runs
int8 x int8 -> int32 at 2x the bf16 rate (394 TOPS), and ESRGAN-class
SR networks tolerate int8 trunks — if the int8 conv actually reaches a
higher fraction of ITS peak, an opt-in quantized trunk is the cfg4 lever.

Probes (all [2, 1080, 1920, 64] -> 64ch 3x3, the RRDB hot shape):
  a. XLA conv bf16 (baseline, expect ~6.5 ms/frame)
  b. XLA conv int8 -> int32 accumulate
  c. XLA conv at 128 in/out channels, bf16 (does width restore MXU
     utilization? decides channel-padding)
  d. int8 cat9 matmul (im2col formulation: [pix, 576] x [576, 64])

Run: nohup python benchmarks/int8_conv_probe.py > /tmp/int8probe.json 2>&1 &
"""


from __future__ import annotations
# allow `python benchmarks/<script>.py` from anywhere
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import numpy as np


def timed_ms(fn, state, iters=8):
    state, cs = fn(state)
    float(np.asarray(cs).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        state, cs = fn(state)
    float(np.asarray(cs).sum())
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vd3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    B, H, W = 2, 1080, 1920
    rng = np.random.default_rng(0)
    results = {}

    def conv_case(name, cin, cout, dtype, acc_dtype):
        x0 = jax.device_put(
            (rng.standard_normal((B, H, W, cin)) * 10).astype(dtype))
        w0 = jax.device_put(
            (rng.standard_normal((3, 3, cin, cout)) * 2).astype(dtype))

        @jax.jit
        def fn(carry):
            x, acc = carry
            y = lax.conv_general_dilated(
                x, w0, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=acc_dtype)
            acc = acc + jnp.sum(y.astype(jnp.float32))
            # chain the input on the carry (loop-invariant hoist guard)
            x = x + (acc.astype(jnp.int32) % 2).astype(x.dtype)
            return (x, acc), acc

        ms = timed_ms(fn, (x0, jnp.float32(0)))
        flop = 2 * B * H * W * 9 * cin * cout
        results[name] = {
            "ms_per_frame": round(ms / B, 3),
            "tflops_effective": round(flop / (ms / 1000) / 1e12, 1),
        }
        print(name, results[name], flush=True)

    conv_case("xla_bf16_64", 64, 64, jnp.bfloat16, jnp.float32)
    conv_case("xla_int8_64", 64, 64, jnp.int8, jnp.int32)
    conv_case("xla_bf16_128", 128, 128, jnp.bfloat16, jnp.float32)
    conv_case("xla_int8_128", 128, 128, jnp.int8, jnp.int32)

    # d) im2col cat9 matmul in int8: [pix, 576] x [576, 64]
    pix = 512 * 1024
    a0 = jax.device_put((rng.standard_normal((pix, 576)) * 10)
                        .astype(np.int8))
    b0 = jax.device_put((rng.standard_normal((576, 64)) * 2)
                        .astype(np.int8))

    @jax.jit
    def mm(carry):
        a, acc = carry
        y = jax.lax.dot(a, b0, preferred_element_type=jnp.int32)
        acc = acc + jnp.sum(y)
        a = a + (acc % 2).astype(jnp.int8)
        return (a, acc), acc

    ms = timed_ms(mm, (a0, jnp.int32(0)))
    flop = 2 * pix * 576 * 64
    results["int8_matmul_576x64"] = {
        "ms": round(ms, 3),
        "tops_effective": round(flop / (ms / 1000) / 1e12, 1),
    }
    print("int8_matmul_576x64", results["int8_matmul_576x64"], flush=True)

    bf16 = results["xla_bf16_64"]["ms_per_frame"]
    i8 = results["xla_int8_64"]["ms_per_frame"]
    results["verdict"] = {
        "int8_speedup_vs_bf16": round(bf16 / i8, 2),
        "lever": "int8 trunk" if bf16 / i8 > 1.4 else "no int8 win",
    }
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
